package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark lacks natively: for each
  * left row, attach the right row with the GREATEST right-time at-or-before
  * the left row's time, within the same key group (backward, inclusive —
  * the pandas `merge_asof` / DuckDB `ASOF JOIN` contract, left-outer).
  *
  * Spark-native formulation (preference order (a) of the build plan — no
  * custom physical operator needed): tag both sides, UNION, and run ONE
  * per-key window ordered by (time, side, tie) carrying the latest right
  * payload forward with `last(ignoreNulls)`; keep the left rows. That is a
  * single hash shuffle on the key — crucially NOT a range join (no
  * per-row probe, no interval explosion), and the window's running state
  * is O(1) per row. Skew follows the key distribution like any window;
  * salt hot keys upstream if one key dominates.
  *
  * Tie semantics: a right row at exactly the left row's time IS matched
  * (side ordering puts right before left at equal times); multiple right
  * rows at the same time resolve to the highest NON-NULL `tieCol` (null
  * ties sort first, so any non-null tie beats them); `tieCol` keeps its
  * own type — string ids order lexicographically, numerics numerically.
  * Null times: right rows with a null time are ignored (a null time is
  * at-or-before nothing), left rows with a null time sort first and match
  * nothing — both per the merge_asof/ASOF contract. */
object AsOfJoin {

  def asOfBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTime: String, rightTime: String,
                   rightPayload: Seq[String], tieCol: String): DataFrame = {
    val leftPayloadCols = left.columns.filterNot(keyCols.contains).toSeq
    val lp = struct(leftPayloadCols.map(col): _*)
    val rp = struct(rightPayload.map(col): _*)
    val rpType = right.select(rp.as("__rp")).schema("__rp").dataType
    val lpType = left.select(lp.as("__lp")).schema("__lp").dataType
    val tieType = right.select(col(tieCol).as("__tie")).schema("__tie").dataType

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        lp.as("__lp"), lit(null).cast(rpType).as("__rp")): _*)
    val r = right.filter(col(rightTime).isNotNull).select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        col(tieCol).as("__tie"),
        lit(null).cast(lpType).as("__lp"), rp.as("__rp")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__asof", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    joined.select(
      keyCols.map(col) ++
        leftPayloadCols.map(c => col("__lp").getField(c).as(c)) ++
        rightPayload.map(c => col("__asof").getField(c).as(c)): _*)
  }
}
