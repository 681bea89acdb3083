package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Property tests for the date parser (SURVEY.md §5 step 2): format→parse
  * round-trips over the formats the compact path accepts, plus totality. */
object DateParserProps extends Properties("DateParser") {

  private val genDate: Gen[LocalDate] = for {
    y <- Gen.choose(1900, 2100)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, LocalDate.of(y, m, 1).lengthOfMonth())
  } yield LocalDate.of(y, m, d)

  private def fmt(p: String) = DateTimeFormatter.ofPattern(p)

  // Zero-padded 4-digit-year shapes: all compact to 8 digits, month-first.
  for (pattern <- Seq("MM/dd/yyyy", "MM-dd-yyyy", "MMddyyyy")) {
    property(s"roundtrip $pattern") = forAll(genDate) { d =>
      DateParser.parseDate(d.format(fmt(pattern))) == Right(d)
    }
  }

  // Unpadded month + padded day: 7 digits for Jan-Sep (1-digit-month rule),
  // 8 for Oct-Dec — both handled by the compact path.
  property("roundtrip Mddyyyy (7/8-digit)") = forAll(genDate) { d =>
    DateParser.parseDate(d.format(fmt("Mddyyyy"))) == Right(d)
  }

  // 2-digit years resolve as +2000, so round-trip holds exactly on 2000-2099.
  property("roundtrip MM/dd/yy over 2000-2099") =
    forAll(genDate.suchThat(d => d.getYear >= 2000 && d.getYear <= 2099)) { d =>
      DateParser.parseDate(d.format(fmt("MM/dd/yy"))) == Right(d)
    }

  // Float-normalized input: a trailing ".0" never changes the result.
  property("float suffix invariance") = forAll(genDate) { d =>
    val s = d.format(fmt("MMddyyyy"))
    DateParser.parseDate(s + ".0") == DateParser.parseDate(s)
  }

  // ISO dates are ALWAYS rejected (quirk preserved from the reference:
  // yyyy-first compacts to month 19/20/21).
  property("ISO format always invalid") = forAll(genDate) { d =>
    DateParser.parseDate(d.format(fmt("yyyy-MM-dd"))).isLeft
  }

  // Totality: never throws, for arbitrary strings.
  property("total on arbitrary strings") = forAll { (s: String) =>
    DateParser.parseDate(s)
    Prop.passed
  }

  // Validation agrees with parse success.
  property("validateDate consistent") = forAll(genDate) { d =>
    DateParser.validateDate(d.format(fmt("MM/dd/yyyy")))
  }
}
