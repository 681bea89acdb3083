package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-governance audit for a curated release: k-anonymity and
  * l-diversity over a quasi-identifier combination. A table is
  * k-anonymous when every quasi-identifier group holds ≥ k rows, and
  * l-diverse when every group carries ≥ l distinct sensitive values —
  * the two standard re-identification gates a training-data release
  * runs before shipping (a k=1 group IS an individual; a 1-diverse
  * group leaks its sensitive value to anyone who can name the group).
  *
  * Shape at scale: the sensitive value is folded into the grouping key
  * FIRST, so distinctness is an exact two-level aggregate — both levels
  * map-side combine and the second input is already one row per
  * (quasi, sensitive), never per source row. No count_distinct expand,
  * no global sort; result size is the quasi-group domain.
  */
object Anonymity {

  /** Per-group audit: the quasi columns, `group_size` (the group's k),
    * `l_distinct` (distinct sensitive values), and `at_risk` — true when
    * the group breaks either gate (size < k, or fewer than `minL`
    * distinct sensitive values). NULL is a legitimate sensitive VALUE
    * for this audit (it still distinguishes a group member), so it
    * counts toward l like any other — hence the count over the grouped
    * frame rather than a null-skipping count(col). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitive: Column, k: Long, minL: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && minL >= 1, s"need k>=1 and minL>=1, got $k, $minL")
    val quasi = quasiCols.map(col)
    df.groupBy(quasi :+ sensitive.as("__sv"): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasi: _*)
      .agg(sum(col("__n")).as("group_size"),
        count(lit(1)).as("l_distinct"))
      .withColumn("at_risk",
        col("group_size") < k || col("l_distinct") < minL)
  }

  /** Release gate headline: rows and groups at risk, table-wide minimum
    * k and l — the four numbers the go/no-go decision reads. One extra
    * combining aggregate over the (small) audit frame. */
  def auditSummary(audit: DataFrame): DataFrame =
    audit.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("at_risk"), 1L).otherwise(0L)).as("groups_at_risk"),
      sum(when(col("at_risk"), col("group_size")).otherwise(0L)).as("rows_at_risk"),
      min(col("group_size")).as("min_k"),
      min(col("l_distinct")).as("min_l"))
}
