package graft.sink

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def plan(rows: Seq[(String, Long, Long)], target: Long) =
    Compaction.planBins(rows.toDF("part", "file", "bytes"),
        "part", "file", "bytes", target)
      .orderBy(col("part"), col("file")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("start-offset packing: hand-checked bins, rollups, big-file isolation") {
    val out = plan(Seq(
      ("a", 1L, 3000L), ("a", 2L, 2000L), ("a", 3L, 4000L),
      ("a", 4L, 500L), ("a", 5L, 500L),
      // a single file over target still gets exactly one bin slot
      ("b", 1L, 9000L), ("b", 2L, 100L)), target = 4000L)
    // prefix sums a: 0,3000,5000,9000,9500 -> bins 0,0,1,2,2
    assert(out === Seq(
      ("a", 1L, 3000L, 0L, 2L, 5000L), ("a", 2L, 2000L, 0L, 2L, 5000L),
      ("a", 3L, 4000L, 1L, 1L, 4000L),
      ("a", 4L, 500L, 2L, 2L, 1000L), ("a", 5L, 500L, 2L, 2L, 1000L),
      ("b", 1L, 9000L, 0L, 1L, 9000L), ("b", 2L, 100L, 2L, 1L, 100L)))
  }

  test("partitions pack independently and the plan is order-insensitive") {
    val rows = Seq(("p", 3L, 10L), ("q", 1L, 10L), ("p", 1L, 10L),
      ("q", 2L, 10L), ("p", 2L, 10L))
    val shuffled = plan(new scala.util.Random(3).shuffle(rows), target = 25L)
    assert(shuffled === plan(rows, target = 25L),
      "input row order must not change the plan")
    // per-partition prefix sums restart at 0
    assert(shuffled.filter(_._1 == "q").map(_._4).toSeq === Seq(0L, 0L))
  }

  test("bins never exceed target by more than the last file (overshoot bound)") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map(f => ("x", f, 1L + rnd.nextInt(5000)))
    val target = 8192L
    val out = plan(rows, target)
    out.groupBy(_._4).foreach { case (_, files) =>
      val total = files.map(_._3).sum
      val largest = files.map(_._3).max
      assert(total - largest < target,
        s"bin minus its last file must stay under target, got $total")
    }
    // every byte is planned exactly once
    assert(out.map(_._3).sum === rows.map(_._3).sum)
  }

  test("planSummary flags exactly the multi-file bins") {
    val s = Compaction.planSummary(
        Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 100L))
          .toDF("part", "file", "bytes"),
        "part", "file", "bytes", targetBytes = 20L)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(s === Seq((0L, 2L, 20L, true), (1L, 1L, 100L, false)))
  }

  test("non-positive target is rejected") {
    intercept[IllegalArgumentException] {
      Compaction.planBins(Seq(("a", 1L, 1L)).toDF("part", "file", "bytes"),
        "part", "file", "bytes", 0L)
    }
  }
}
