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

  /** Generalize a numeric quasi-identifier UP a bucket hierarchy until
    * the release is k-anonymous: level L buckets the value by
    * `baseBucket`·2^L, and the chosen level is the SMALLEST one whose
    * minimum group size reaches k — well-defined because each level-L+1
    * bucket is the union of exactly two level-L buckets, so the minimum
    * group size is monotone in L. Groups still under k at `maxLevels`
    * (e.g. a sparse negative-value bucket that no widening can merge
    * away) come back flagged `suppressed` — generalize-then-suppress,
    * the standard release pipeline.
    *
    * Scale shape: rows collapse ONCE to the level-0 grouped frame (one
    * combining shuffle); the level sweep explodes only that GROUPED
    * frame (coarser counts roll up exactly from level-0 counts via
    * arithmetic-shift floor division — floor(floor(x/b)/2^L) =
    * floor(x/(b·2^L))), and the chosen level is a ONE-ROW frame crossed
    * back in, so the fixpoint search never re-scans or re-shuffles the
    * data and never touches the driver. Output: one row per final
    * group — (fixed quasi cols, bucket, group_size, suppressed,
    * gen_level). */
  def generalizeNumericToK(df: DataFrame, fixedQuasi: Seq[String],
                           value: Column, baseBucket: Long, k: Long,
                           maxLevels: Int = 20): DataFrame = {
    require(baseBucket > 0 && k >= 1 && maxLevels >= 0,
      s"need baseBucket>0, k>=1, maxLevels>=0; got $baseBucket, $k, $maxLevels")
    val quasi = fixedQuasi.map(col)
    val g0 = df
      .groupBy(quasi :+ floor(value / baseBucket).cast("long").as("__b0"): _*)
      .agg(count(lit(1)).as("__n"))
    val sizes = g0
      .withColumn("level", explode(array((0 to maxLevels).map(lit): _*)))
      .withColumn("__b", expr("shiftright(__b0, level)"))
      .groupBy(quasi :+ col("level") :+ col("__b"): _*)
      .agg(sum(col("__n")).as("__gn"))
    val chosen = sizes.groupBy(col("level")).agg(min(col("__gn")).as("__mn"))
      .agg(coalesce(min(when(col("__mn") >= k, col("level"))),
        lit(maxLevels)).as("gen_level"))
    sizes.join(broadcast(chosen), col("level") === col("gen_level"))
      .select(quasi :+ col("__b").as("bucket") :+ col("__gn").as("group_size")
        :+ (col("__gn") < k).as("suppressed") :+ col("gen_level"): _*)
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
