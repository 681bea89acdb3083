package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus construction — the operator that turns
  * "use 10% of web text but 100% of books" into a reproducible dataset.
  * Beyond-reference extension (SURVEY.md §7.1.9).
  *
  * Reproducibility is the design constraint: `df.sample()` draws from a
  * per-partition RNG, so its output changes with partitioning, task retries,
  * and engine version — unacceptable for training-data lineage. Instead the
  * keep-decision is a PURE FUNCTION of the row's id: Knuth multiplicative
  * hashing (id · 2654435761 mod 2^32 — the golden-ratio constant spreads
  * consecutive ids uniformly) taken mod 1000 yields a per-mille slot, and a
  * row survives iff its slot < the stratum's configured rate. The same row
  * therefore survives in every run, on every engine, at every scale — and
  * the whole operator is one shuffle-free codegen'd filter.
  *
  * The arithmetic stays in BIGINT range (id ≤ 2^31 ⇒ product ≤ 2^63) and is
  * plain integer multiply/mod — expressible identically in ANSI SQL, which
  * is what makes the operator DuckDB-oracle-able end to end.
  */
object Sampling {

  /** Knuth's multiplicative constant (2^32 / φ, odd). */
  val KnuthMultiplier = 2654435761L

  /** Per-mille sampling slot of an id: hash to [0, 1000). */
  def perMilleSlot(id: Column): Column =
    pmod(id * KnuthMultiplier, lit(4294967296L)) % 1000

  /** Stratified deterministic sample: `rates` maps stratum value →
    * keep-rate in per-mille; strata not in the map keep `defaultPerMille`.
    * One narrow filter — no shuffle, no RNG, no driver state. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultPerMille: Int = 0): DataFrame = {
    require((rates.values ++ Seq(defaultPerMille)).forall(r => r >= 0 && r <= 1000),
      "rates are per-mille: 0..1000")
    val rate = rates.foldLeft(lit(defaultPerMille)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(perMilleSlot(col(idCol)) < rate)
  }
}
