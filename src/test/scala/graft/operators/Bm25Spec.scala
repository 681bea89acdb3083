package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 scoring on a corpus small enough to verify by hand formula. */
class Bm25Spec extends SparkSpec {

  // 4 docs; query terms "cat" and "dog".
  //  d1: cat cat dog + 3 filler  (dl 6, tf_cat 2, tf_dog 1)
  //  d2: cat + 5 filler          (dl 6, tf_cat 1)
  //  d3: 4 filler                (dl 4)
  //  d4: dog dog dog dog         (dl 4, tf_dog 4)
  private val docs = Seq(
    (1L, "cat cat dog f1 f2 f3"),
    (2L, "cat g1 g2 g3 g4 g5"),
    (3L, "h1 h2 h3 h4"),
    (4L, "dog dog dog dog"))

  private def bm25Ref(tf: Long, dl: Long, df: Long,
                      n: Long, avgdl: Double): BigDecimal = {
    val k1 = 1.2; val b = 0.75
    val idf = BigDecimal(math.log((n.toDouble - df + 0.5) / (df + 0.5) + 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    BigDecimal(idf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  test("scores match the hand formula; ranking and ties deterministic") {
    val s = spark; import s.implicits._
    val out = Bm25.score(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("cat", "dog"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 4L; val avgdl = 20.0 / 4
    val want = Map(
      1L -> (bm25Ref(2, 6, 2, n, avgdl) + bm25Ref(1, 6, 2, n, avgdl)),
      2L -> bm25Ref(1, 6, 2, n, avgdl),
      4L -> bm25Ref(4, 4, 2, n, avgdl))
    assert(out.keySet === want.keySet, "doc 3 (no query term) must be absent")
    for ((id, w) <- want)
      assert(math.abs(out(id) - w.toDouble) < 1e-9, s"doc $id: ${out(id)} vs $w")
  }

  test("topK truncates by (score desc, id) total order") {
    val s = spark; import s.implicits._
    val top1 = Bm25.score(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("cat", "dog"), topK = 1).collect()
    assert(top1.length === 1)
    // doc 1 matches BOTH query terms (~1.543) and beats doc 4's
    // saturating tf=4 single-term score (~1.215) — tf saturation working
    // as BM25 intends
    assert(top1.head.getLong(0) === 1L)
  }

  test("plan: idf broadcast back, top-k is TakeOrdered (no global window)") {
    val s = spark; import s.implicits._
    val p = Bm25.score(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("cat", "dog")).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "idf frame must broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrdered, not a sorted window")
  }
}
