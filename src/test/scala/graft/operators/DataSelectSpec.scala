package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSIR importance weights: bucket bounds, ranking behavior, featureless
  * docs, determinism, and the selection cut. */
class DataSelectSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a cat and another cat on a mat"),
    (3L, "cats love mats and naps")).toDF("doc_id", "text")
  private val raw = Seq(
    (10L, "the cat sat on the mat"),          // verbatim in-target
    (11L, "stock market futures fell today"), // fully off-target
    (12L, "a cat on a mat naps"),             // partly in-target
    (13L, "")                                 // featureless
  ).toDF("doc_id", "text")

  test("buckets are bounded and deterministic across partitionings") {
    val fb = DataSelect.featureBuckets(raw, "doc_id", "text", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fb.nonEmpty && fb.forall { case (_, b) => b >= 0 && b < 64 })
    val fb2 = DataSelect.featureBuckets(raw.repartition(5), "doc_id", "text",
        buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fb.sorted.toSeq == fb2.sorted.toSeq)
  }

  test("in-target docs outrank off-target; featureless doc gets 0/NULL") {
    val w = DataSelect.dsirWeights(raw, target, "doc_id", "text",
        buckets = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    // the verbatim-target doc must beat the off-target doc decisively,
    // and the partial match must land in between
    assert(w(10L)._2 > w(12L)._2 && w(12L)._2 > w(11L)._2,
      s"ranking violated: $w")
    assert(w(13L)._1 == 0L && w(13L)._2.isNaN, s"featureless doc: ${w(13L)}")
    // per-feature-occurrence count: doc 10 has 6 unigrams + 5 bigrams
    assert(w(10L)._1 == 11L)
  }

  test("streaming DSIR: per-batch feature extraction, weights ≡ batch exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsir-stream").toString
    try {
      val src = s"$tmp/raw"
      raw.repartition(3).write.parquet(src) // 3 files → 3 micro-batches
      val stream = graft.streaming.StreamingIngest
        .runStreamDsirBounded(spark, src, target, "doc_id", "text",
          buckets = 256)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2)))
      val batch = DataSelect
        .dsirWeights(spark.read.parquet(src), target, "doc_id", "text",
          buckets = 256)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2)))
      assert(stream.nonEmpty && stream.toSeq === batch.toSeq,
        "streamed DSIR diverged from batch — bucket counts must be replay-invariant")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(tmp))
  }

  test("selection is the weight order cut, excluding featureless docs") {
    val sel = DataSelect.dsirSelect(raw, target, "doc_id", "text", k = 2,
        buckets = 256)
      .collect().map(_.getLong(0)).toSeq
    assert(sel == Seq(10L, 12L), s"top-2 must be the in-target docs: $sel")
    // determinism under corpus repartitioning
    val sel2 = DataSelect.dsirSelect(raw.repartition(7), target, "doc_id",
        "text", k = 2, buckets = 256)
      .collect().map(_.getLong(0)).toSeq
    assert(sel2 == sel)
  }

  private def bruteFront(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.map(_._1).toSet

  test("pareto front == brute-force dominance on random data with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // small coordinate domain forces equal-x, equal-y, and equal-point
    // collisions — the tie semantics the window derivation must get right
    val pts = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val got = DataSelect.paretoFront2D(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got == bruteFront(pts), "window front diverged from the definition")
    assert(got.nonEmpty && got.size < pts.size)
  }

  test("pareto front keeps ALL copies of an undominated duplicate point") {
    import spark.implicits._
    val pts = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 5L, 12L),
      (4L, 5L, 5L), (5L, 12L, 3L))
    val got = DataSelect.paretoFront2D(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet
    // (5,5) dominated by (5,12) and (10,10); duplicates of (10,10) both
    // stay (neither strictly dominates the other)
    assert(got == Set(1L, 2L, 3L, 5L))
    assert(got == bruteFront(pts))
  }

  test("grouped pareto front == independent per-group brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, s"g${i % 3}", rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    val got = DataSelect.paretoFront2D(pts.toDF("id", "g", "x", "y"),
        "x", "y", groupCols = Seq("g"))
      .collect().map(_.getLong(0)).toSet
    val want = pts.groupBy(_._2).values.flatMap(grp =>
      bruteFront(grp.map(t => (t._1, t._3, t._4)))).toSet
    assert(got == want, "per-group fronts must be independent")
    assert(got.size > bruteFront(pts.map(t => (t._1, t._3, t._4))).size,
      "fixture sanity: grouping must admit points the global front rejects")
  }

  test("streaming pareto: standing front folds across batches, ≡ batch, order-invariant") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-pareto-stream").toString
    try {
      val rnd = new scala.util.Random(31)
      val pts = Seq.tabulate(200)(i =>
        (i.toLong, rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val want = bruteFront(pts)
      def run(src: String) = graft.streaming.StreamingIngest
        .runStreamParetoBounded(spark, src, "x", "y")
        .collect().map(_.getLong(0)).toSet
      val (b1, b2, b3) = (pts.take(70), pts.slice(70, 140), pts.drop(140))
      val fwd = s"$tmp/fwd"
      b1.toDF("id", "x", "y").coalesce(1).write.parquet(fwd)
      b2.toDF("id", "x", "y").coalesce(1).write.mode("append").parquet(fwd)
      b3.toDF("id", "x", "y").coalesce(1).write.mode("append").parquet(fwd)
      assert(run(fwd) == want, "stream front must equal the batch front")
      val rev = s"$tmp/rev"
      b3.toDF("id", "x", "y").coalesce(1).write.parquet(rev)
      b1.toDF("id", "x", "y").coalesce(1).write.mode("append").parquet(rev)
      b2.toDF("id", "x", "y").coalesce(1).write.mode("append").parquet(rev)
      assert(run(rev) == want, "dominance merge must be arrival-order-invariant")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(tmp))
  }

  test("pareto front: null coordinates are excluded, not dominant") {
    import spark.implicits._
    val df = Seq((1L, Some(3L), Some(3L)), (2L, None, Some(99L)),
      (3L, Some(99L), None)).toDF("id", "x", "y")
    val got = DataSelect.paretoFront2D(df, "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }
}
