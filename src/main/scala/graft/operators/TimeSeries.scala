package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series rate monitoring over an event stream — the ingest-anomaly
  * gate a continuously-fed corpus needs: a key whose arrival rate spikes
  * (crawler loop, duplicate feed) or collapses (dead source) should fail
  * loudly BEFORE the data lands in training.
  *
  * Determinism contract: the anomaly test is pure INTEGER arithmetic.
  * With s = Σ trailing counts, ssq = Σ trailing counts², over exactly `w`
  * trailing buckets, the z-test |cnt − mean| > k·σ_pop rearranges to
  *
  *   (w·cnt − s)² > k²·(w·ssq − s²)
  *
  * — no division, no sqrt, no doubles — so the flagged set hash-matches
  * any engine that sums the same longs (BIGINT-exact in the DuckDB
  * oracle). Both directions flag: spikes AND collapses.
  */
object TimeSeries {

  /** Per-(key, bucket) event counts with EMPTY BUCKETS ZERO-FILLED over
    * the global [min, max] bucket span — a silent source must surface as
    * rows of zeros, not as absent rows the window silently skips. The
    * grid is keys × span-buckets via a per-key `sequence` explode (narrow;
    * grid size = |keys| · span/bucket, independent of event volume).
    * `usMicros` must be epoch micros (LONG); bucket = us div bucketMicros,
    * computed with exact integer arithmetic (`us - pmod` before the
    * divide — epoch-scale longs exceed double-exact division). */
  def bucketCounts(df: DataFrame, keyCol: String, usMicros: Column,
                   bucketMicros: Long): DataFrame =
    densify(rawBucketCounts(df, keyCol, usMicros, bucketMicros))

  /** Sparse per-(key, bucket) counts — also the shape the STREAMING twin
    * materializes from its state store, which is why it is split out:
    * batch and stream share [[densify]] + [[anomaliesFromCounts]] verbatim,
    * and exact integer counts make the two paths bit-identical. */
  def rawBucketCounts(df: DataFrame, keyCol: String, usMicros: Column,
                      bucketMicros: Long): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
        bucketExpr(usMicros, bucketMicros).as("bucket"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Exact integer bucket of an epoch-micros column (us div bucketMicros;
    * the `us - pmod` form keeps the double division exact — epoch-scale
    * longs exceed double-exact direct division). The ONE bucketing both
    * the batch operator and the streaming twin must share: the streaming
    * query reuses the batch DuckDB oracle verbatim, which is only sound
    * while both paths bucket identically. */
  def bucketExpr(usMicros: Column, bucketMicros: Long): Column =
    ((usMicros - pmod(usMicros, lit(bucketMicros))) /
      lit(bucketMicros)).cast("long")

  /** Zero-fill a sparse (key, bucket, cnt) frame over the global bucket
    * span (one 2-long driver row; grid = |keys| · span buckets). */
  def densify(counts: DataFrame): DataFrame = {
    val span = counts.agg(min(col("bucket")), max(col("bucket"))).head()
    if (span.isNullAt(0)) return counts // empty input: nothing to densify
    val (minB, maxB) = (span.getLong(0), span.getLong(1))
    counts.select(col("key")).distinct()
      .select(col("key"),
        explode(sequence(lit(minB), lit(maxB))).as("bucket"))
      .join(counts, Seq("key", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
  }

  /** Buckets whose count deviates more than `k` population-σ from the
    * trailing `window` buckets' mean, per key. Buckets without a full
    * trailing history are not judged (a half-window mean is not a
    * baseline). One key-keyed window over the DENSIFIED grid — the rolling
    * state is grid-sized, never event-volume-sized. Output:
    * (key, bucket, cnt, trail_sum, trail_sumsq), integer-exact. */
  def rateAnomalies(df: DataFrame, keyCol: String, usMicros: Column,
                    bucketMicros: Long, window: Int, k: Int): DataFrame =
    anomaliesFromCounts(
      bucketCounts(df, keyCol, usMicros, bucketMicros), window, k)

  /** The trailing-window integer z-test over an ALREADY-densified
    * (key, bucket, cnt) frame. */
  def anomaliesFromCounts(filled: DataFrame, window: Int, k: Int): DataFrame = {
    require(window >= 2 && k >= 1, "need window >= 2 and k >= 1")
    val trail = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(-window, -1)
    val wL = lit(window.toLong)
    filled
      .withColumn("trail_sum", sum(col("cnt")).over(trail))
      .withColumn("trail_sumsq", sum(col("cnt") * col("cnt")).over(trail))
      .withColumn("__np", count(lit(1)).over(trail))
      .filter(col("__np") === window &&
        (wL * col("cnt") - col("trail_sum")) *
          (wL * col("cnt") - col("trail_sum")) >
        lit(k.toLong * k) *
          (wL * col("trail_sumsq") - col("trail_sum") * col("trail_sum")))
      .select(col("key"), col("bucket"), col("cnt"),
        col("trail_sum"), col("trail_sumsq"))
  }
}
