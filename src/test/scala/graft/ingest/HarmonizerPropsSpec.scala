package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.SparkSpec
import graft.schema.{ColumnMappings, Schemas}

/** Property tests for the DORMANT harmonization branches (SURVEY §7.4.7):
  * the sentinel-row filter and strict mode are exercised by the golden
  * pipeline only on fixed examples, but their contracts are universal —
  * random layouts, random sentinel positions, random null patterns. Each
  * trial is a tiny local DataFrame, so the suites stay fast.
  *
  * Pinned divergence (documented in SURVEY §7.4.7): the reference indexes
  * row 0 and throws on non-string frames; the rebuild filters `|`-prefixed
  * first-column values ROBUSTLY at any position. These properties pin the
  * robust semantics so a refactor back toward row-0-only filtering fails
  * loudly.
  */
object HarmonizerPropsSpec extends Properties("HarmonizerProps") {

  private lazy val spark = SparkSpec.session

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  // --- generators -----------------------------------------------------

  private val genCell: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumStr.map(_.take(8)),
    1 -> Gen.const(null),
    2 -> Gen.alphaNumStr.map(s => "|" + s.take(6)),        // sentinel
    1 -> Gen.const("|H|not|the|expected|header"))

  private val sourceCols: Seq[String] = ColumnMappings.columnMap.keys.toSeq

  /** A random layout: non-empty subset of known source columns, shuffled,
    * plus 0-2 unmapped extras. */
  private val genLayout: Gen[Seq[String]] = for {
    subset <- Gen.someOf(sourceCols).suchThat(_.nonEmpty)
    extras <- Gen.choose(0, 2)
    shuffled <- Gen.const(scala.util.Random.shuffle(
      subset.toSeq ++ (1 to extras).map(i => s"Unmapped_$i")))
  } yield shuffled

  private def dfOf(cols: Seq[String], rows: Seq[Seq[String]]) = {
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 2), schema)
  }

  // --- properties -----------------------------------------------------

  property("sentinel filter drops exactly |-prefixed first-column rows, anywhere") =
    forAll(Gen.listOfN(10, genCell), Gen.chooseNum(0, 10)) { (cells, cut) =>
      val rows = cells.take(cut).zipWithIndex.map { case (c, i) =>
        Seq(c, i.toString)
      }
      val df = dfOf(Seq("Name", "ID"), rows)
      val survivors = Harmonizer.stripSentinelRows(df)
        .collect().map(_.getString(1)).toSet
      val expected = rows.collect {
        case Seq(first, id) if first == null || !first.startsWith("|") => id
      }.toSet
      survivors == expected
    }

  property("strict throws iff a mandatory target is unmapped, naming every missing") =
    forAll(genLayout) { cols =>
      val df = dfOf(cols, Seq(cols.map(_ => "x")))
      val mapped = cols.flatMap(ColumnMappings.columnMap.get).toSet
      val missing = ColumnMappings.mandatoryColumns.filterNot(mapped.contains)
      if (missing.isEmpty) {
        (Harmonizer.harmonize(df, strict = true).count() == 1L) :| "no throw expected"
      } else {
        val e = try {
          Harmonizer.harmonize(df, strict = true); None
        } catch { case e: IllegalArgumentException => Some(e) }
        e.exists(ex => missing.forall(m => ex.getMessage.contains(m))) :| s"missing=$missing got=$e"
      }
    }

  property("non-strict harmonize always emits the fixed canonical schema") =
    forAll(genLayout) { cols =>
      val df = dfOf(cols, Seq(cols.map(_ => "v"), cols.map(_ => null)))
      val out = Harmonizer.harmonize(df, filename = Some("usa_file.csv"))
      (out.columns.toSeq == Schemas.canonicalColumns) :| "column order" &&
        out.schema.fields.forall(_.dataType == StringType) :| "all strings" &&
        (out.count() == 2L) :| "row preservation"
    }

  property("country fallback fires exactly when no source maps to Country") =
    forAll(genLayout) { cols =>
      val df = dfOf(cols, Seq(cols.map(_ => "v")))
      val hasCountrySource =
        cols.exists(c => ColumnMappings.columnMap.get(c).contains("Country"))
      val got = Harmonizer.harmonize(df, filename = Some("ind_batch1.csv"))
        .select("Country").head().getString(0)
      if (hasCountrySource) (got == "v") :| s"source wins, got $got"
      else (got == "IND") :| s"filename fallback, got $got"
    }

  property("duplicate-target sources coalesce in map insertion order, not frame order") =
    forAll(Gen.option(Gen.alphaNumStr.map(_.take(5))),
           Gen.option(Gen.alphaNumStr.map(_.take(5))),
           Gen.oneOf(true, false)) { (idVal, uniqueIdVal, reversed) =>
      // "ID" precedes "Unique ID" in the column map; frame order must not matter
      val cols = if (reversed) Seq("Unique ID", "ID", "Name")
                 else Seq("ID", "Unique ID", "Name")
      val row = cols.map {
        case "ID" => idVal.orNull
        case "Unique ID" => uniqueIdVal.orNull
        case _ => "n"
      }
      val got = Harmonizer.harmonize(dfOf(cols, Seq(row)))
        .select("Customer_Id").head().getString(0)
      got == idVal.orElse(uniqueIdVal).orNull
    }

  property("embedded |H| header is found in any column of row 0") =
    forAll(Gen.chooseNum(0, 3), Gen.oneOf(true, false)) { (headerCol, matching) =>
      val h = if (matching) Schemas.expectedHeader else "|H|some|other|layout"
      val row0 = (0 to 3).map(i => if (i == headerCol) h else s"c$i")
      val rows = Seq(row0, Seq("a", "b", "c", "d"))
      // single partition pins row order — the same file-order convention
      // the reference relies on (data_validator.py:227-230)
      val schema = StructType((0 to 3).map(i =>
        StructField(s"col$i", StringType, nullable = true)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row.fromSeq(r)), 1), schema)
      val found = Harmonizer.extractEmbeddedHeader(df)
      found.contains(h) &&
        Harmonizer.checkEmbeddedHeader(df).contains(matching)
    }
}
