package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — the second time-series operator Spark lacks a
  * native physical strategy for. A naive formulation
  * (`points JOIN intervals ON key AND t BETWEEN s AND e`) planifies as a
  * BroadcastNestedLoopJoin or shuffled cartesian per key — quadratic in the
  * hot key's row count.
  *
  * Bucketized formulation: quantize time into `bucketWidth` bins; each
  * point lands in exactly ONE bin, each interval explodes to the bins it
  * covers (intervals spanning b bins appear b times — pick the width near
  * the typical interval length so b stays small). The join is then a plain
  * EQUI-join on (key, bin) + an exact containment filter. Because a point
  * has one bin, every qualifying (interval, point) pair meets exactly once
  * — no post-join dedup. One hash shuffle each side; skew follows
  * (key, bin) density, salt upstream if one bin dominates. */
object RangeJoin {

  /** Pairs (interval, point) with `startCol <= pointCol < endCol` per key.
    * Time columns must be long-valued (e.g. epoch micros); `endCol` is
    * exclusive. Output: key columns + all interval columns + all point
    * columns (caller projects). */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          keyCols: Seq[String], pointCol: String,
                          startCol: String, endCol: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / bucketWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
    i.join(p, keyCols :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
