package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multinomial NB on a corpus small enough to verify by hand formula. */
class ClassifySpec extends SparkSpec {

  // Training: two clearly-separated classes with one shared term.
  //   sports: "ball goal ball", "goal ball team"
  //   tech:   "code bug code",  "bug code team"
  private val train = Seq(
    (1L, "ball goal ball", "sports"),
    (2L, "goal ball team", "sports"),
    (3L, "code bug code", "tech"),
    (4L, "bug code team", "tech"))

  private def lp(c: Long, nL: Long, v: Long): BigDecimal =
    BigDecimal(math.log((c + 1.0) / (nL.toDouble + v)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("predictions and scores match the hand-computed posterior") {
    val s = spark; import s.implicits._
    val score = Seq(
      (10L, "ball ball goal"),  // clear sports
      (11L, "code code bug"),   // clear tech
      (12L, "team"),            // shared term only: priors tie, label asc
      (13L, "zzz qqq"))         // all-OOV: prior-only, tie -> "sports"
    val out = Classify.naiveBayes(
        train.toDF("doc_id", "text", "label"), score.toDF("doc_id", "text"),
        "doc_id", "text", "label")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2), r.getLong(3))))
      .toMap

    // vocab = {ball, goal, team, code, bug} -> V=5; n_sports = n_tech = 6
    val v = 5L
    val prior = BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // doc 10 under sports: ball(c=3) x2, goal(c=2) x1
    val s10 = prior + lp(3, 6, v) * 2 + lp(2, 6, v)
    assert(out(10L)._1 === "sports")
    assert(math.abs(out(10L)._2 - s10.toDouble) < 1e-9)
    assert(out(10L)._3 === 3L)
    assert(out(11L)._1 === "tech")
    // doc 12: "team" has c=1 under both labels -> identical scores, label
    // asc tie-break picks "sports"
    assert(out(12L)._1 === "sports")
    assert(out(12L)._3 === 1L)
    // doc 13: no in-vocab tokens -> prior-only score, tie -> "sports"
    assert(out(13L)._1 === "sports")
    assert(math.abs(out(13L)._2 - prior.toDouble) < 1e-9)
    assert(out(13L)._3 === 0L)
  }

  test("in-vocab token unseen for a label gets the smoothed mass, not dropped") {
    val s = spark; import s.implicits._
    // "goal" never appears under tech: P(goal|tech) = 1/(6+5)
    val out = Classify.naiveBayes(
        train.toDF("doc_id", "text", "label"),
        Seq((20L, "goal goal goal goal")).toDF("doc_id", "text"),
        "doc_id", "text", "label")
      .collect().head
    val v = 5L
    val prior = BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val wantSports = (prior + lp(2, 6, v) * 4).toDouble
    val wantTech = (prior + lp(0, 6, v) * 4).toDouble
    assert(out.getString(1) === "sports")
    assert(math.abs(out.getDouble(2) - wantSports) < 1e-9)
    assert(wantSports > wantTech, "smoothed unseen-mass must lose to seen mass")
  }

  test("streaming inference equals batch scoring, replay-idempotent") {
    val s = spark; import s.implicits._
    val trainDf = train.toDF("doc_id", "text", "label")
    val scoreRows = Seq((10L, "ball ball goal"), (11L, "code code bug"),
      (12L, "team"), (13L, "zzz qqq"))
    val batch = Classify.naiveBayes(trainDf, scoreRows.toDF("doc_id", "text"),
        "doc_id", "text", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-clf").toString
    // one doc per file, PLUS a duplicated doc (a replayed batch): the
    // per-doc dedup must make the duplicate invisible
    scoreRows.zipWithIndex.foreach { case ((id, tx), i) =>
      Seq((id, tx)).toDF("doc_id", "text").write.parquet(s"$dir/f$i")
    }
    Seq(scoreRows.head).toDF("doc_id", "text").write.parquet(s"$dir/replay")
    val streamed = graft.streaming.StreamingIngest.runStreamClassifyBounded(
        s, trainDf, dir + "/*/", "doc_id", "text", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed === batch)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("imbalanced priors shift the prior-only prediction") {
    val s = spark; import s.implicits._
    val skewed = (train :+ ((5L, "extra words here", "tech"))).toDF("doc_id", "text", "label")
    val out = Classify.naiveBayes(skewed,
        Seq((30L, "zzz")).toDF("doc_id", "text"), "doc_id", "text", "label")
      .collect().head
    assert(out.getString(1) === "tech", "3/5 tech prior must win the OOV doc")
  }
}
