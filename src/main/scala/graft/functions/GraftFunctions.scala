package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** One parse → both outputs: the error channel feeds quarantine annotation
  * (reference `data_validator.py:146-191`), the value channel feeds the typed
  * clean frame (parse-once-at-ingest, SURVEY.md §1.2). */
case class DateParse(error: String, value: java.sql.Date)

/** Column-level entry points for the engine's one custom scalar function.
  *
  * A Scala UDF (not a Python UDF — stays in the JVM, no serialization hop) is
  * the correctness-first implementation; the date-parse projection is the only
  * place whole-stage codegen breaks, and it runs once per ingested row, not in
  * any analytic hot path (SURVEY.md §7.3).
  */
object GraftFunctions {

  /** Full parse: struct(error, value). Exactly one of the fields is null. */
  val parseDateStructUdf = udf { (s: String) =>
    DateParser.parseDate(s) match {
      case Right(d)  => DateParse(null, java.sql.Date.valueOf(d))
      case Left(err) => DateParse(err, null)
    }
  }

  def parse_date_struct(c: Column): Column = parseDateStructUdf(c)

  /** Parsed date or null (validation error swallowed). */
  val parseDateUdf = udf { (s: String) => DateParser.parseOrNull(s) }
  def parse_date(c: Column): Column = parseDateUdf(c)

  /** Error message or null (valid). */
  val parseDateErrUdf = udf { (s: String) => DateParser.parseError(s) }
  def parse_date_err(c: Column): Column = parseDateErrUdf(c)

  /** SQL registration for spark.sql access. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("parse_date_graft", parseDateUdf)
    spark.udf.register("parse_date_err_graft", parseDateErrUdf)
  }
}
