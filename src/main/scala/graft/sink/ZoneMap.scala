package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: cluster a table on a column at write time, keep
  * one (file, min, max, rows) stats row per data file, and answer range
  * reads by consulting the stats FIRST — whole files whose [min, max]
  * envelope misses the predicate are never opened, not even their
  * footers.
  *
  * This is the data-layout half of scan pruning that partition pruning
  * can't cover: partitioning is for LOW-cardinality discrete keys (one
  * directory per value), zone maps for ORDERED high-cardinality ones
  * (dates, sequence numbers) where range-clustering gives each file a
  * narrow envelope. At 100 TB the difference is opening tens of files
  * instead of tens of thousands — parquet row-group stats still prune,
  * but only after a footer read per file, and the KB-scale stats table
  * replaces those million footer round-trips with one driver-side
  * filter. Same design as Delta/Iceberg file statistics.
  *
  * Layout: `path/data/` (range-clustered parquet) + `path/zonemap/`
  * (the stats parquet). The stats are rebuilt from the written files in
  * one grouped pass over `_metadata.file_path`, so they are always
  * derived from what's actually on disk, never trusted from the writer.
  */
object ZoneMap {

  /** Range-cluster `df` on `sortCol` into `nFiles` files and write the
    * zone-map stats next to the data. Sorting WITHIN partitions keeps
    * parquet row-group stats tight too — the two pruning layers nest. */
  def writeClustered(df: DataFrame, path: String, sortCol: String,
                     nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(s"$path/data")
    val spark = df.sparkSession
    spark.read.parquet(s"$path/data")
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(sortCol)).as("mn"), max(col(sortCol)).as("mx"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/zonemap")
  }

  /** The stats table: (file, mn, mx, n_rows), one row per data file. */
  def stats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/zonemap")

  /** Data files whose [mn, mx] envelope intersects [lo, hi] — the
    * driver-side collect is FILE-count sized, the whole point.
    *
    * SANCTIONED BOUNDED COLLECT (inventory: BloomIndex / ZoneMap /
    * PrefixSum / Dedup.maxDriverEdges): one row per data file BEFORE the
    * envelope filter, usually far fewer after (clustering is what makes
    * envelopes disjoint). Same arithmetic as BloomIndex.candidateFiles:
    * ~4×10⁵ paths at 100 TB / 256 MB files ≈ tens of driver MB.
    * ZoneMapSpec pins the stats cardinality to the file count. */
  def survivingFiles(spark: SparkSession, path: String,
                     lo: Column, hi: Column): Seq[String] =
    stats(spark, path)
      .filter(col("mx") >= lo && col("mn") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Range read `sortCol ∈ [lo, hi]` via the zone map: scan only the
    * surviving files, then apply the residual row filter (file envelopes
    * are coarser than rows; boundary files carry out-of-range rows). The
    * residual filter still pushes down into the surviving files' parquet
    * row groups — the two pruning layers nest. */
  def readRange(spark: SparkSession, path: String, sortCol: String,
                lo: Column, hi: Column): DataFrame = {
    val files = survivingFiles(spark, path, lo, hi)
    val base =
      if (files.isEmpty)
        // schema-correct empty relation; a false predicate over the full
        // file list plans a footer-only scan
        spark.read.parquet(s"$path/data").filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(sortCol) >= lo && col(sortCol) <= hi)
  }
}
