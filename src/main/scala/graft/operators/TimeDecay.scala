package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponential time-decay aggregation — the standard recency-weighted
  * feature of event-driven curation (recent behavior matters more): per
  * key, Σ value·exp(−λ·Δt) and the decayed event count Σ exp(−λ·Δt),
  * where Δt is the age in days at a caller-supplied `asOf` instant.
  * Beyond-reference extension; pairs with [[Sessionize]]/[[Funnel]] on the
  * events surface.
  *
  * `asOf` is a PARAMETER, not current_timestamp() — the same determinism
  * rule the reference's view queries follow (SURVEY §7.4.5): a feature
  * snapshot must be reproducible later. Timestamps come in as epoch
  * MICROSECOND longs (the events surface's normalized form), so the age
  * is a double division of exact integers — identical IEEE in any engine.
  *
  * Scale shape: one narrow projection computes each event's decayed
  * weight, then ONE key-partitioned map-side-combined aggregation — the
  * grain never exceeds (key), no window, no self-join.
  *
  * Determinism: each term is ROUNDED to 6dp then summed as exact decimal
  * (the TfIdf contract), so sums are order- and engine-independent.
  * Events after `asOf` are EXCLUDED (their weight would exceed 1 — a
  * leakage bug, not a feature; the gate is a filter, loudly visible in
  * row counts, not a silent clamp). */
object TimeDecay {

  /** Per-`keyCol` decayed aggregate of `valueCol` at `asOfMicros`:
    * output (keyCol, n_events, decayed_sum, decayed_count), with
    * `halfLifeDays` controlling λ = ln(2)/halfLife. `usCol` holds epoch
    * microseconds; null values are excluded (they carry no mass). */
  def decayedAgg(df: DataFrame, keyCol: String, usCol: String,
                 valueCol: String, asOfMicros: Long,
                 halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, "decayedAgg: halfLifeDays must be positive")
    val lambda = math.log(2.0) / halfLifeDays
    val ageDays = (lit(asOfMicros) - col(usCol)).cast("double") / lit(86400e6)
    val w = exp(lit(-lambda) * ageDays)
    df.filter(col(usCol) <= asOfMicros && col(valueCol).isNotNull)
      .select(col(keyCol),
        round(w * col(valueCol).cast("double"), 6)
          .cast("decimal(18,6)").as("__wv"),
        round(w, 6).cast("decimal(18,6)").as("__w"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__wv")).cast("double").as("decayed_sum"),
        sum(col("__w")).cast("double").as("decayed_count"))
  }
}
