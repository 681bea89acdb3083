package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.expr.KllSketchAgg

/** Mergeable quantile summaries (KLL compactor stack,
  * [[graft.expr.KllSketchAgg]]) — rank order statistics in bounded memory,
  * completing the summary family next to Misra–Gries (frequent items), HLL
  * (distincts) and Count-Min (point frequencies). The 100-TB shape: map
  * tasks each carry one k·log-sized buffer, only summaries cross the
  * shuffle, and per-segment summaries union into coarser rollups without
  * rescanning — the property exact percentile_cont can never have. The
  * same buffer runs as streaming state
  * ([[graft.streaming.StreamingIngest.runStreamQuantileBounded]]).
  *
  * Guarantee (worst-case, self-reported, checked in-engine by the
  * `_verify` harness queries): for the value v returned at target rank r,
  * the exact rank interval [#{x < v}, #{x ≤ v}] intersects [r − err,
  * r + err], where `err` is the sketch's own compaction ledger; and every
  * returned value is a genuine input value (compaction only ever selects,
  * never invents).
  */
object QuantileSketch {

  /** The raw aggregate column: struct(n, err, items[(value, weight)]). */
  def summary(valueCol: Column, k: Int): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(valueCol), k)
        .toAggregateExpression())

  /** Per-(segment, p) quantile estimates over `valueCol` cast to long:
    * (segment, p, est_value, n, err). */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     k: Int, ps: Seq[Double]): DataFrame = {
    val sk = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("segment"))
      .agg(summary(col(valueCol).cast("long"), k).as("__sk"))
    quantilesFromSummaries(sk, ps)
  }

  /** Expand a (segment, __sk) summary frame into per-(segment, p) estimate
    * rows: `est_value` is the smallest summary value whose cumulative
    * weight reaches the target rank ⌈p·n⌉ (≥ 1); weights sum to n exactly
    * (compaction conserves total weight), so the target is always
    * reachable. Shared verbatim by the batch operator and the streaming
    * runner so their gates compare like for like. The explode is
    * summary-sized (k·log n items per segment), not data-sized. */
  def quantilesFromSummaries(sk: DataFrame, ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(col("segment"))
      .orderBy(col("value"), col("weight"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sk.select(col("segment"), col("__sk.n").as("n"),
        col("__sk.err").as("err"), explode(col("__sk.items")).as("it"))
      .select(col("segment"), col("n"), col("err"),
        col("it.value").as("value"), col("it.weight").as("weight"))
      .withColumn("__cum", sum(col("weight")).over(w))
      .withColumn("p", explode(typedlit(ps)))
      .withColumn("__target",
        greatest(ceil(col("p") * col("n").cast("double")).cast("long"), lit(1L)))
      .filter(col("__cum") >= col("__target"))
      .groupBy(col("segment"), col("p"))
      .agg(min(col("value")).as("est_value"),
        first(col("n")).as("n"), first(col("err")).as("err"))
  }

  /** In-engine violation check of the KLL guarantee. `estimates` is a
    * (segment, p, est_value, n, err) frame — from [[groupQuantiles]] or
    * the streaming runner — and `values` the EXACT (segment, v) stream it
    * summarized (nulls pre-dropped, v already long). One exact broadcast
    * join + aggregation — affordable at gate scale; the sketch exists so
    * the production path never pays it. Checks, per (segment, p):
    *   - N:       the sketch's n equals the exact count;
    *   - RANK:    [#{x < v}, #{x ≤ v}] intersects [⌈p·n⌉ − err, ⌈p·n⌉ + err];
    *   - PHANTOM: v occurs in the data (#{x ≤ v} > #{x < v}).
    * Violations only; oracle = empty relation. */
  def violations(estimates: DataFrame, values: DataFrame): DataFrame = {
    // Null-safe segment keys throughout (the repo-wide stream-vs-batch
    // convention, NullSegmentSpec-enforced): a NULL segment is a real
    // segment — plain equality would orphan its estimates and skip its
    // rank checks entirely.
    val est = estimates.select(col("segment").as("e_seg"), col("p"),
      col("est_value"), col("n"), col("err"))
    val ranked = values
      .join(broadcast(est), col("segment") <=> col("e_seg"))
      .groupBy(col("segment"), col("p"), col("est_value"), col("n"), col("err"))
      .agg(
        sum(when(col("v") < col("est_value"), 1L).otherwise(0L)).as("rank_low"),
        sum(when(col("v") <= col("est_value"), 1L).otherwise(0L)).as("rank_high"),
        count(col("v")).as("n_exact"))
      .withColumn("__target",
        greatest(ceil(col("p") * col("n").cast("double")).cast("long"), lit(1L)))
    // a segment present in estimates but absent from values would vanish
    // from the inner join above — surface it instead of silently passing
    val orphans = est.join(values.select(col("segment")).distinct(),
        col("e_seg") <=> col("segment"), "left_anti")
      .select(col("e_seg").as("segment"), col("p"),
        lit("segment_without_values").as("issue"))
    ranked
      .withColumn("issue",
        when(col("n") =!= col("n_exact"), lit("n_mismatch"))
          .when(col("rank_high") < col("__target") - col("err") ||
                col("rank_low") > col("__target") + col("err"),
            lit("rank_outside_err_bound"))
          .when(col("rank_high") === col("rank_low"), lit("phantom_value")))
      .filter(col("issue").isNotNull)
      .select(col("segment"), col("p"), col("issue"))
      .unionAll(orphans)
  }
}
