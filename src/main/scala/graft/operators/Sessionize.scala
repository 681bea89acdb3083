package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — the canonical event-pipeline operator: group each key's
  * event stream into sessions separated by inactivity gaps longer than
  * `gap`. (The reference pipeline is batch ETL with no event streams; this
  * is part of the training-data/events extension surface, SURVEY.md §7.1.9.)
  *
  * Spark-first shape: ONE window shuffle on (key, order-by time) computes
  * the lag-gap flag and the running session ordinal in the same window
  * frame, so sessionization costs exactly one exchange regardless of
  * session count. No UDF, no state — at 100 TB this is the plan you want:
  * partition by user (high-cardinality ⇒ even), sort within partition.
  * For a LIVE stream the same semantics run as
  * `groupBy(session_window(ts, gap))` in Structured Streaming; this batch
  * form is for backfill/bounded corpora.
  *
  * Ties: events at the same (key, ts) are ordered by `tieCol` so the lag
  * chain (and therefore the session split) is total-order deterministic.
  */
object Sessionize {

  /** Label each event with its session ordinal (1-based per key, in time
    * order). A new session starts on the first event and whenever
    * `ts - prev_ts > gap` (strictly greater: an event exactly `gap` after
    * its predecessor continues the session). `tsCol` must be long-valued
    * (epoch micros — integer arithmetic, no timestamp-type divergence). */
  def withSessionIds(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     tieCol: String, gap: Long): DataFrame = {
    require(gap > 0, "gap must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L)
    // running sum of session starts over the SAME window spec: the two
    // window functions plan as stacked Window operators over ONE exchange
    // (same partitioning/ordering) — sessionization still costs a single
    // shuffle (asserted in CorpusOpsSpec).
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Collapse events into one row per session: key columns, session ordinal,
    * start/end time, event count. Two stages, one partitioning: the window
    * shuffle of [[withSessionIds]] already clusters by key, and the groupBy
    * re-uses that clustering (same key prefix) plus the session ordinal. */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 tieCol: String, gap: Long): DataFrame =
    withSessionIds(df, keyCols, tsCol, tieCol, gap)
      .groupBy((keyCols :+ "session_seq").map(col): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
