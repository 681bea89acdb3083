package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Funnel analysis — ordered-step conversion over an event stream ("of the
  * users who viewed, who then clicked, who then purchased?"). Beyond-
  * reference event-pipeline extension (SURVEY.md §7.1.9).
  *
  * Semantics: per key, `t_1` is the earliest event matching step 1, and
  * `t_i` (i > 1) is the earliest event matching step i STRICTLY AFTER
  * `t_{i-1}`. This greedy earliest-chain is complete: an ordered chain
  * v_1 < v_2 < ... < v_n exists in the key's events iff every `t_i` is
  * non-null — because v_1 ≥ t_1 implies a step-2 match after t_1 exists
  * (v_2 works), so t_2 ≤ v_2, and so on inductively. `depth` is therefore
  * the true furthest step reached, and the t_i are the earliest-completion
  * chain.
  *
  * Spark-first shape: each `t_i` is a conditional `min` over the SAME
  * unordered key window, referencing `t_{i-1}` from the previous
  * projection — Catalyst stacks the Window operators over ONE exchange
  * (they share the partitioning spec), and the final per-key collapse
  * reuses that clustering. One shuffle for any number of steps; no joins,
  * no collect_list (per-key event lists never materialize — hot users
  * cannot blow memory).
  */
object Funnel {

  /** One row per key: `t_<step>` epoch-long columns (null = step not
    * reached) and `depth` = number of completed steps. `steps` are
    * (name, predicate) in funnel order; `tsCol` must be long-valued. */
  def funnel(df: DataFrame, keyCols: Seq[String], tsCol: String,
             steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val withTimes = steps.zipWithIndex.foldLeft(df) {
      case (acc, ((name, pred), i)) =>
        val cond =
          if (i == 0) pred
          else {
            val prev = col(s"t_${steps(i - 1)._1}")
            pred && prev.isNotNull && col(tsCol) > prev
          }
        acc.withColumn(s"t_$name", min(when(cond, col(tsCol))).over(w))
    }
    val tCols = steps.map { case (name, _) => s"t_$name" }
    // Fold in step order so each LATER step's check wraps the accumulated
    // expression — the final CASE tests the deepest step first.
    val depth = tCols.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (t, idx)) =>
        when(col(t).isNotNull, lit((idx + 1).toLong)).otherwise(acc)
    }
    withTimes
      .groupBy(keyCols.map(col): _*)
      .agg(first(col(tCols.head)).as(tCols.head),
        tCols.tail.map(t => first(col(t)).as(t)): _*)
      .withColumn("depth", depth)
  }
}
