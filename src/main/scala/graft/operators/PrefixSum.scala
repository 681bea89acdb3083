package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (cumulative sum in a total order) — the building
  * block for token-budget corpus selection, quota assignment, and ordered
  * allocation generally.
  *
  * A naive `sum().over(Window.orderBy(k))` collapses the whole table into
  * ONE task (Spark warns: "No Partition Defined for Window operation") —
  * the classic 100 TB scale-killer. This implementation keeps every stage
  * parallel:
  *
  *  1. deterministic range bucketing: approxQuantile boundaries on the
  *     order key (a GK sketch — no RNG, so bucket assignment is stable
  *     across recomputations, unlike repartitionByRange's sampled
  *     partitioner) → a small CASE cascade assigns each row a bucket;
  *  2. per-bucket totals → driver (bounded by bucket count), exclusive-
  *     scanned into per-bucket offsets, shipped back as a map literal
  *     (broadcast-join territory if buckets ever numbered millions);
  *     SANCTIONED BOUNDED COLLECT (inventory: BloomIndex / ZoneMap /
  *     PrefixSum / Dedup.maxDriverEdges): exactly ≤ `buckets` (int,
  *     long) rows cross to the driver regardless of input cardinality —
  *     at the default 32 buckets that is bytes, and even 10⁶ buckets
  *     (far past the point range partitioning should take over) is
  *     ~16 MB. The spec pins the shipped offset-map literal to
  *     ≤ 2·buckets entries;
  *  3. per-bucket ordered window (parallel across buckets) + offset.
  *
  * The order key must be unique (a total order) for the result to be
  * well-defined, and NUMERIC — the approxQuantile range-bucketing in
  * step 1 only supports numeric columns (a string key, e.g. a UUID
  * conversation id, is rejected up front with a clear message instead
  * of an obscure approxQuantile error mid-plan; hash or zip such keys
  * to a numeric order key upstream). Values are summed as longs. */
object PrefixSum {

  def withPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                    out: String = "cumsum", buckets: Int = 32): DataFrame = {
    val keyType = df.schema(orderCol).dataType
    require(keyType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"withPrefixSum: order key '$orderCol' must be numeric (got " +
        s"${keyType.simpleString}) — range bucketing uses approxQuantile, " +
        "which only supports numeric columns; map string ids to a numeric " +
        "key (e.g. xxhash64, or a dense zip) before the prefix sum")
    // null values count as 0 (a null-valued bucket would otherwise sum to
    // null and NPE the driver-side read)
    val v = coalesce(col(valueCol).cast("long"), lit(0L))
    val splits =
      if (buckets <= 1) Array.empty[Double]
      else df.stat.approxQuantile(orderCol,
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
    // Null order keys go to bucket 0: `null <= s` is null, so they would
    // otherwise fall through every branch into the LAST bucket while the
    // within-bucket window sorts them first — inconsistent with Spark's
    // global asc-nulls-FIRST ordering this operator emulates.
    val bucket = when(col(orderCol).isNull, lit(0)).otherwise(
      splits.zipWithIndex.foldRight(lit(splits.length): Column) {
        case ((s, i), rest) => when(col(orderCol) <= s, lit(i)).otherwise(rest)
      })
    // Materialized once: three consumers follow (partials collect, window
    // pass, caller's action), and a recomputed nondeterministic input could
    // otherwise surface buckets absent from the collected offset map.
    val bucketed = df.withColumn("__bucket", bucket).localCheckpoint()
    val partials = bucketed.groupBy("__bucket").agg(sum(v).as("psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxB = if (partials.isEmpty) 0 else partials.keys.max
    val offsets = (0 to maxB).scanLeft(0L)(
      (acc, b) => acc + partials.getOrElse(b, 0L)).init
    val offsetMap = map((0 to maxB).flatMap(b =>
      Seq(lit(b), lit(offsets(b)))): _*)
    val w = Window.partitionBy(col("__bucket")).orderBy(col(orderCol))
    bucketed
      .withColumn(out, sum(v).over(w) + element_at(offsetMap, col("__bucket")))
      .drop("__bucket")
  }

  /** In-array EXCLUSIVE prefix sum: `[a,b,c]` → `[0, a, a+b]` — the
    * per-item offsets of items laid end-to-end inside one row. Built in
    * ONE O(n) aggregate pass whose state carries (offsets-so-far,
    * running total), replacing the O(n²) per-item
    * `aggregate(slice(lens, 1, i))` re-fold: for a 4-item fixture the
    * difference is noise, but an interleaved web document with hundreds
    * of items re-folded the whole prefix per item. The state append is
    * a raw array copy (amortized cheap), not an interpreted
    * re-evaluation of the prefix. Null elements count as 0 — one null
    * would otherwise poison every later offset. */
  def exclusiveArrayOffsets(lens: Column): Column =
    aggregate(lens,
      struct(array().cast("array<long>").as("offs"), lit(0L).as("tot")),
      (acc, x) => struct(
        concat(acc.getField("offs"), array(acc.getField("tot"))).as("offs"),
        (acc.getField("tot") + coalesce(x.cast("long"), lit(0L))).as("tot")),
      acc => acc.getField("offs"))

  /** Budgeted selection: keep rows, in `orderCol` order, while the running
    * `valueCol` total stays within `budget` (the first row to cross the
    * budget is excluded). The canonical "fill a token budget by priority"
    * corpus operation. */
  def selectWithinBudget(df: DataFrame, orderCol: String, valueCol: String,
                         budget: Long, buckets: Int = 32): DataFrame =
    withPrefixSum(df, orderCol, valueCol, out = "__cumsum", buckets = buckets)
      .filter(col("__cumsum") <= budget)
      .drop("__cumsum")
}
