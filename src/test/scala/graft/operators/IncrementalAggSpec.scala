package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  // base: group a {1,2}, b {3}, c {4}, d {5}
  private val base = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L),
    ("c", 4L, 40L), ("d", 5L, 50L)).toDF("g", "id", "v")

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

  test("refresh over touched groups equals a full recompute") {
    // new base: row 1 updated (a), row 3 deleted (b gone entirely),
    // row 6 inserted into NEW group e, row 4 reassigned c -> d
    val newBase = Seq(("a", 1L, 99L), ("a", 2L, 20L), ("d", 4L, 40L),
      ("d", 5L, 50L), ("e", 6L, 60L)).toDF("g", "id", "v")
    // touched = old and new owners of every changed row
    val touched = Seq("a", "b", "c", "d", "e").toDF("g")
    val out = IncrementalAgg.refreshTouchedGroups(newBase, touched,
      aggOf(base), Seq("g"),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
      .orderBy(col("g")).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
    val full = aggOf(newBase).orderBy(col("g")).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == full.toSeq)
    // b (fully deleted) is gone; e (new) appeared; d absorbed the move
    assert(out.map(_._1).toSeq == Seq("a", "d", "e"))
  }

  test("untouched groups are carried verbatim, not recomputed") {
    val newBase = Seq(("a", 1L, 99L), ("a", 2L, 20L), ("b", 3L, 30L),
      ("c", 4L, 40L), ("d", 5L, 50L)).toDF("g", "id", "v")
    // stored aggregate DELIBERATELY stale for untouched group d: if the
    // operator recomputed it, the sentinel would be repaired — it must
    // survive, proving rows are carried, not recomputed
    val staleMat = aggOf(base)
      .withColumn("sv", when(col("g") === "d", lit(-777L)).otherwise(col("sv")))
    val out = IncrementalAgg.refreshTouchedGroups(newBase,
        Seq("a").toDF("g"), staleMat, Seq("g"),
        Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out("a") == 119L) // recomputed
    assert(out("d") == -777L) // carried verbatim — the proof
  }

  test("misaligned stored-aggregate columns fail fast") {
    val wrong = aggOf(base).withColumnRenamed("sv", "total")
    intercept[IllegalArgumentException] {
      IncrementalAgg.refreshTouchedGroups(base, Seq("a").toDF("g"), wrong,
        Seq("g"), Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
    }
  }

  test("empty touched set returns the stored aggregate unchanged") {
    val out = IncrementalAgg.refreshTouchedGroups(base,
        Seq.empty[String].toDF("g"), aggOf(base), Seq("g"),
        Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
      .orderBy(col("g")).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
    val mat = aggOf(base).orderBy(col("g")).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == mat.toSeq)
  }
}
