package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.{ColumnMappings, Schemas}

/** Schema harmonization: heterogeneous per-country CSVs → one canonical
  * string-typed layout (reference `main.py:30-62` + `data_validator.py:53-108`,
  * operators S1/S2/P1-P5/U1 in SURVEY.md §2).
  *
  * Spark-first shape: each *layout* is one lazy `DataFrame`; harmonization is
  * a single `select` of `coalesce(...)` expressions computed from the column
  * map, so Catalyst sees a plain projection (prunable, pushdown-friendly) and
  * the files of a layout are scanned with full input-split parallelism.
  *
  * Scale note (100 TB): files are grouped by header so N files collapse into
  * a handful of scans — per-layout `spark.read.csv(paths*)`, not a
  * per-file loop. Only the header probe (1 line per file) touches the driver;
  * with millions of files you would instead pre-bucket paths by layout
  * convention, which this API accepts directly via [[loadGrouped]].
  */
object Harmonizer {

  /** Coalesce-projection (P3): source columns → canonical names.
    *
    * Reproduces `data_validator.py:66-87` exactly:
    *  - only mapped source columns survive (unmapped ones silently dropped);
    *  - when several source columns feed one target, they coalesce in
    *    *column-map insertion order* (`:76-82`), not frame order;
    *  - a canonical column with no source is emitted as a typed null so every
    *    harmonized frame shares one fixed schema (the reference omits the
    *    column and lets `pd.concat` null-fill — same data, dynamic schema).
    *
    * Country enrichment (P4): when no source column maps to `Country`, derive
    * `upper(filename[:3])` (`data_validator.py:89-93`).
    */
  def harmonize(df: DataFrame, filename: Option[String] = None,
                strict: Boolean = false): DataFrame =
    harmonizeWith(df, filename.map(f => lit(f.take(3).toUpperCase)), strict)

  /** Like [[harmonize]] but the country fallback is any Column — at scale the
    * caller passes a per-row `input_file_name()`-derived expression so one
    * scan can span files from many countries. */
  def harmonizeWith(df: DataFrame, countryFallback: Option[org.apache.spark.sql.Column],
                    strict: Boolean = false): DataFrame = {
    val present = df.columns.toSet
    val exprs = Schemas.canonicalColumns.map { target =>
      val sources = ColumnMappings.columnMap.collect {
        case (src, tgt) if tgt == target && present.contains(src) => col(src)
      }.toSeq
      target match {
        case _ if sources.nonEmpty =>
          (if (sources.size > 1) coalesce(sources: _*) else sources.head).as(target)
        case "Country" if countryFallback.isDefined =>
          countryFallback.get.cast("string").as("Country")
        case _ => lit(null).cast("string").as(target)
      }
    }
    val mapped = present.flatMap(ColumnMappings.columnMap.get)
    val missingMandatory = ColumnMappings.mandatoryColumns.filterNot(mapped.contains)
    if (strict && missingMandatory.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing mandatory columns: ${missingMandatory.mkString("[", ", ", "]")}")
    stripSentinelRows(df).select(exprs: _*)
  }

  /** P1: drop embedded `|`-prefixed records (the dormant `|H|...` header
    * convention, `data_validator.py:227-230`). The reference indexes row 0
    * and throws on non-string frames; the rebuild filters robustly, same
    * intent (SURVEY.md §7.4.7). */
  def stripSentinelRows(df: DataFrame): DataFrame = {
    val first = col(df.columns.head)
    df.filter(first.isNull || !first.startsWith("|"))
  }

  /** P2: extract an embedded `|H|` header from the FIRST ROW ONLY — the
    * reference probes ANY column of `df.iloc[0]` (`data_validator.py:227-230`
    * uses `.any()` across the row), so every column of the one probed row is
    * checked, not just the first. This stays bounded work: a
    * filter-then-limit over the whole frame would scan every row of a layout
    * that has no embedded header before concluding so. Caveat (documented,
    * matching the reference's own file-order assumption): `limit(1)` without
    * an ordering returns the first row in file order by convention only. */
  def extractEmbeddedHeader(df: DataFrame): Option[String] =
    df.limit(1).collect().headOption.flatMap { row =>
      (0 until row.length).iterator
        .map(i => if (row.isNullAt(i)) null else row.get(i).toString)
        .find(v => v != null && v.startsWith("|H|"))
    }

  def headerMatches(header: String): Boolean = header == Schemas.expectedHeader

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** P2 wired into the load path: probe one layout for an embedded `|H|`
    * header row and WARN (only — never fail) on mismatch, reproducing
    * `data_validator.py:227-230` + `:37-50`. Returns Some(matched) when an
    * embedded header exists, None otherwise; the 1-row probe is bounded
    * driver work per layout, not per file. */
  def checkEmbeddedHeader(df: DataFrame): Option[Boolean] =
    extractEmbeddedHeader(df).map { h =>
      val ok = headerMatches(h)
      if (!ok) log.warn(
        s"Header does not match expected format.\nExpected: ${Schemas.expectedHeader}\nReceived: $h")
      ok
    }

  /** S1/S2: read one CSV layout all-string (`inferSchema=false` reproduces
    * the reference's string-first ingestion, `data_validator.py:141-143`). */
  def readCsv(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(paths: _*)

  /** Group CSV paths by header line so each distinct layout becomes ONE scan.
    * The one-line-per-file header probe runs as a tiny Spark job over the
    * path list (~128 paths per task): at millions of input files a serial
    * driver-side open+readLine loop is an O(n_files) bottleneck before the
    * first real task launches. The collect is bounded by design — one
    * (header, path) pair per file, the same metadata the grouping needs
    * on the driver to plan the per-layout scans. */
  def groupByLayout(spark: SparkSession, dir: String): Map[String, Seq[String]] = {
    // Resolve the filesystem from the probed path (not the default FS) so
    // s3a://, hdfs://, and file:// directories all probe correctly.
    val globPath = new org.apache.hadoop.fs.Path(s"$dir/*.csv")
    val fs = globPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus returns null (not an empty array) for a nonexistent
    // parent directory on some FS implementations — normalize before map.
    val files = Option(fs.globStatus(globPath)).getOrElse(Array.empty)
      .map(_.getPath.toString).toSeq
    if (files.isEmpty) return Map.empty
    // Ship the session's Hadoop conf so executor-side opens see the same
    // credentials/FS settings the driver resolved (s3a keys, etc.).
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val slices = math.max(1, math.min(files.length / 128 + 1,
      spark.sparkContext.defaultParallelism))
    val probed = spark.sparkContext.parallelize(files, slices).map { pStr =>
      val p = new org.apache.hadoop.fs.Path(pStr)
      val in = p.getFileSystem(confSer.value).open(p)
      val header = try {
        new java.io.BufferedReader(new java.io.InputStreamReader(
          in, java.nio.charset.StandardCharsets.UTF_8)).readLine()
      } finally in.close()
      (if (header == null) "" else header) -> pStr
    }.collect()
    probed.groupBy(_._1).map { case (h, ps) => h -> ps.map(_._2).toSeq }
  }

  /** Per-row country-from-filename expression (P4, `data_validator.py:89-93`):
    * first 3 chars of the basename, uppercased — computed from real file
    * lineage instead of a driver-side literal. */
  def countryFromFileName: org.apache.spark.sql.Column =
    upper(substring(regexp_extract(input_file_name(), "([^/]+)$", 1), 1, 3))

  /** U1: harmonize each layout group and union by name (`pd.concat` aligns by
    * column name, `main.py:60`); fixed canonical schema makes the union a
    * zero-copy plan concat. */
  def loadGrouped(spark: SparkSession, groups: Map[String, Seq[String]]): DataFrame = {
    require(groups.nonEmpty, "no CSV files found to load")
    val frames = groups.toSeq.sortBy(_._1).map { case (_, paths) =>
      val raw = readCsv(spark, paths)
      checkEmbeddedHeader(raw) // P2: warn-only embedded-header layout check
      harmonizeWith(raw, Some(countryFromFileName))
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** S1 end-to-end: enumerate the directory's CSVs, group by layout,
    * harmonize, union (reference `load_source_data`, `main.py:30-62`). */
  def loadSourceData(spark: SparkSession, dir: String): DataFrame =
    loadGrouped(spark, groupByLayout(spark, dir))
}
