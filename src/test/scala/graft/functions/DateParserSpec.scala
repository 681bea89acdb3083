package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Branch-level checks + the 543-case golden corpus generated from the
  * reference implementation (src/test/resources/dateparser_golden.json). */
class DateParserSpec extends AnyFunSuite {

  private def ok(s: String): String =
    DateParser.parseDate(s).fold(e => fail(s"'$s' should parse, got: $e"), _.toString)
  private def err(s: String): String =
    DateParser.parseDate(s).fold(identity, d => fail(s"'$s' should fail, got: $d"))

  test("compact path: month-first M(M)-DD-YY(YY)") {
    assert(ok("05/11/2022") == "2022-05-11")
    assert(ok("12/13/1997") == "1997-12-13")
    assert(ok("03/12/2022") == "2022-03-12") // ambiguous day/month → month-first
    assert(ok("12282021") == "2021-12-28")   // 8 digits
    assert(ok("6152022") == "2022-06-15")    // 7 digits → 1-digit month
    assert(ok("1052022") == "2022-01-05")
  }

  test("2-digit years get +2000") {
    assert(ok("12/31/21") == "2021-12-31")
    assert(ok("01/02/99") == "2099-01-02")
  }

  test("float normalization truncates and strips leading zeros") {
    assert(ok("6152022.0") == "2022-06-15")
    assert(ok("0102022") == "2022-10-20") // "0102022"→float→"102022"→M=10,D=20,Y=2022
  }

  test("ISO dates always fail via the compact path") {
    assert(err("1998-03-12") == "Invalid month: 19 (must be between 1 and 12)")
    assert(err("2021-13-13") == "Invalid month: 20 (must be between 1 and 12)")
    assert(err("2022/1/1") == "Invalid month: 20 (must be between 1 and 12)")
  }

  test("reference's %4 leap rule (1900/2100 treated as leap)") {
    assert(ok("02/29/2000") == "2000-02-29")
    assert(ok("2/29/2096") == "2096-02-29")
    assert(err("02/30/2020") == "Invalid day: 30 (maximum 29 days in month 2)")
    // passes %4 rule, fails real calendar → falls through to fallback error
    assert(err("02/29/1900").startsWith("Unable to parse date '02/29/1900'"))
  }

  test("range checks with reference messages") {
    assert(err("13/13/2022") == "Invalid month: 13 (must be between 1 and 12)")
    assert(err("123456789") == "Invalid year: 56789 (must be between 1900 and 2100)")
  }

  test("empty / null") {
    assert(err("") == "Empty date string")
    assert(err("   ") == "Empty date string")
    assert(err(null) == "Empty date string")
  }

  test("golden corpus: full parity with the reference parser") {
    val stream = getClass.getClassLoader.getResourceAsStream("dateparser_golden.json")
    val root = new ObjectMapper().readTree(stream)
    var n = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    root.elements().asScala.foreach { node =>
      val in = node.get("in").asText()
      val got = DateParser.parseDate(in)
      if (node.has("ok")) {
        val want = node.get("ok").asText()
        if (!got.toOption.map(_.toString).contains(want))
          failures += s"'$in': want OK $want, got $got"
      } else if (node.has("err")) {
        val want = node.get("err").asText()
        if (!got.left.toOption.contains(want))
          failures += s"'$in': want ERR [$want], got $got"
      }
      n += 1
    }
    assert(n > 500, s"corpus unexpectedly small: $n")
    assert(failures.isEmpty,
      s"${failures.size}/$n mismatches:\n${failures.take(20).mkString("\n")}")
  }
}
