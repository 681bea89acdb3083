package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass table profiling — the data-quality summary a pipeline runs
  * before trusting a new corpus drop: per column, row count, null count,
  * distinct count, and min/max, as ONE aggregation over ONE scan (the
  * naive per-column loop reads the table N times).
  *
  * Output: (col_name, n_rows, n_nulls, n_distinct, min_value, max_value)
  * — min/max surfaced as strings so one schema profiles every column
  * type, and NULL for all-null columns (min/max of nothing).
  *
  * Scale shape: one scan; the exact-distinct form expands the aggregate
  * (Spark's multi-COUNT(DISTINCT) Expand — one shuffle carrying n_cols
  * replicas of the key columns), which is the exact-oracle contract.
  * `exact = false` swaps in HyperLogLog++ `approx_count_distinct`: the
  * Expand disappears, the whole profile becomes one partial-agg pass with
  * fixed-size sketch state — the 100 TB default, at ±rsd accuracy. */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exact: Boolean = true, rsd: Double = 0.01): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "profile: no columns")
    require(cols.forall(df.columns.contains), s"profile: unknown column in $cols")
    require(cols.distinct.size == cols.size, s"profile: duplicate column in $cols")
    // internal aliases are INDEXED, never derived from user column names —
    // a name containing '.' or '`' would break col()-re-resolution
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nn_$i"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__mn_$i"),
        max(col(c)).cast("string").as(s"__mx_$i"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one row -> one output row per column, via an exploded struct array
    // (pure projection — no second aggregation, no extra scan)
    val entries = array(cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      col(s"__nn_$i").as("n_nulls"),
      col(s"__nd_$i").as("n_distinct"),
      col(s"__mn_$i").as("min_value"),
      col(s"__mx_$i").as("max_value")) }: _*)
    one.select(explode(entries).as("__e")).select(col("__e.*"))
  }
}
