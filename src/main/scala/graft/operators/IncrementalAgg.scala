package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance: after a CDC batch
  * lands, refresh a stored per-group aggregate by recomputing ONLY the
  * touched groups and keeping every untouched group's row verbatim.
  *
  * Full refresh shuffles the whole base per cycle; touched-group refresh
  * shuffles only rows of affected groups (the semi-join probe side is the
  * batch's key set, broadcast-sized by assumption — a CDC batch touching
  * most groups IS a full refresh and should be run as one). Recompute-
  * from-base is chosen over delta-patching (old ± new contributions)
  * deliberately: it is correct for EVERY aggregate including MIN/MAX
  * (not incrementally maintainable under deletes), needs no before-
  * images in the feed, and cannot drift — untouched rows are carried
  * byte-identical, touched rows are exactly what a full recompute would
  * produce, so the invariant `refresh ≡ full recompute` is testable and
  * the harness hash-gates it.
  *
  * Pair with a group-aligned layout (partitioning or [[graft.sink.ZoneMap]]
  * clustering on the group key) and the scan side prunes to touched
  * groups too, completing the incremental story.
  */
object IncrementalAgg {

  /** @param newBase    the post-CDC base table
    * @param touchedKeys distinct group keys affected by the batch (both
    *                    old and new owners of reassigned rows — deriving
    *                    this set is the caller's CDC-shape knowledge)
    * @param matAgg      the stored aggregate (groupCols ++ agg columns);
    *                    its aggregate column names must match `aggs`'
    *                    aliases — checked, since a silent mismatch would
    *                    union misaligned columns
    * @param aggs        the aggregate expressions, aliased */
  def refreshTouchedGroups(newBase: DataFrame, touchedKeys: DataFrame,
                           matAgg: DataFrame, groupCols: Seq[String],
                           aggs: Seq[Column]): DataFrame = {
    require(groupCols.nonEmpty && aggs.nonEmpty,
      "refreshTouchedGroups: need group columns and aggregates")
    val recomputed = newBase
      .join(broadcast(touchedKeys.select(groupCols.map(col): _*).distinct()),
        groupCols, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    require(matAgg.columns.toSeq == recomputed.columns.toSeq,
      s"stored aggregate columns ${matAgg.columns.toSeq} don't match " +
        s"recomputed ${recomputed.columns.toSeq}")
    // untouched rows carried VERBATIM (groups whose every row was deleted
    // simply have no recomputed row and disappear, as a full recompute
    // would drop them)
    val untouched = matAgg
      .join(broadcast(touchedKeys.select(groupCols.map(col): _*).distinct()),
        groupCols, "left_anti")
    untouched.unionByName(recomputed)
  }
}
