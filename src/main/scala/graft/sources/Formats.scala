package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink surface: the engine's tables round-trip through
  * every bundled columnar/text format (parquet is the native warehouse
  * format in [[graft.sink.Warehouse]]; this adds json, orc, and csv — the
  * reference's own ingest format — behind one API).
  *
  * Schema discipline: reads always re-apply the WRITER's schema instead of
  * inferring — inference is both a correctness trap (json widens ints,
  * csv strings everything) and a 100 TB anti-pattern (inference is an
  * extra full scan of the data before the real one). */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  /** Write `df` to `path` in `format`, read it back with the original
    * schema. Overwrites — callers may reuse a deterministic path. */
  def roundTrip(df: DataFrame, format: String, path: String): DataFrame = {
    require(supported.contains(format), s"unsupported format: $format")
    val w = df.write.mode("overwrite")
    (format match {
      case "csv" => w.option("header", "true")
      case other => w
    }).format(format).save(path)
    read(df.sparkSession, format, path, df.schema)
  }

  /** Schema-applied read of `path` in `format` (no inference pass). */
  def read(spark: SparkSession, format: String, path: String,
           schema: StructType): DataFrame = {
    val r = spark.read.schema(schema)
    (format match {
      case "csv" => r.option("header", "true")
      case other => r
    }).format(format).load(path)
  }
}
