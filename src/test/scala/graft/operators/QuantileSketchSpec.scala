package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)

  test("groupQuantiles: estimates honor the rank ledger; violations empty") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(8000) { i =>
      (if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        rnd.nextLong() % 100000)
    }
    val df = rows.toDF("seg", "v")
    val est = QuantileSketch.groupQuantiles(df, "seg", "v", k = 128, ps)
    val got = est.collect()
    assert(got.length == 3 * ps.size, "one row per (segment, p)")
    val values = df.select(col("seg").cast("string").as("segment"), col("v"))
    assert(QuantileSketch.violations(est, values).count() === 0L)
    // spot-check the median is genuinely central: exact rank of the p=0.5
    // estimate within err of n/2
    val (estMid, err) = est.filter($"segment" === "a" && $"p" === 0.5)
      .select($"est_value", $"err").as[(Long, Long)].head()
    val aVals = rows.collect { case ("a", v) => v }.sorted
    val trueRank = aVals.count(_ <= estMid)
    assert(math.abs(trueRank - aVals.size / 2.0) <= err + 1)
  }

  test("violations flags rigged estimates: wrong n, phantom value, bad rank") {
    val df = Seq.tabulate(1000)(i => ("s", i.toLong)).toDF("segment", "v")
    val values = df
    // est_value 500 exists; n lies (2000 vs 1000) -> n_mismatch
    val wrongN = Seq(("s", 0.5, 500L, 2000L, 10L))
      .toDF("segment", "p", "est_value", "n", "err")
    assert(QuantileSketch.violations(wrongN, values)
      .select($"issue").as[String].collect().toSeq == Seq("n_mismatch"))
    // value 5000000 never occurred -> phantom (rank interval empty)
    val phantom = Seq(("s", 0.99, 5000000L, 1000L, 2000L))
      .toDF("segment", "p", "est_value", "n", "err")
    assert(QuantileSketch.violations(phantom, values)
      .select($"issue").as[String].collect().toSeq == Seq("phantom_value"))
    // value 10 at p=0.99 with err=5: target 990, rank(10)=11 -> outside
    val badRank = Seq(("s", 0.99, 10L, 1000L, 5L))
      .toDF("segment", "p", "est_value", "n", "err")
    assert(QuantileSketch.violations(badRank, values)
      .select($"issue").as[String].collect().toSeq ==
        Seq("rank_outside_err_bound"))
    // a segment with no exact rows surfaces, never silently passes
    val orphan = Seq(("ghost", 0.5, 1L, 1L, 1L))
      .toDF("segment", "p", "est_value", "n", "err")
    assert(QuantileSketch.violations(orphan, values)
      .select($"issue").as[String].collect().toSeq ==
        Seq("segment_without_values"))
  }

  test("quantile estimates are exact when n < k (no compaction ever fires)") {
    val df = Seq.tabulate(50)(i => ("s", i.toLong + 1)).toDF("seg", "v")
    val est = QuantileSketch.groupQuantiles(df, "seg", "v", k = 128, ps)
      .select($"p", $"est_value", $"err").as[(Double, Long, Long)]
      .collect().map { case (p, v, e) => (p, (v, e)) }.toMap
    ps.foreach { p =>
      val (v, e) = est(p)
      assert(e === 0L, "no compaction -> zero error ledger")
      assert(v === math.max(math.ceil(p * 50).toLong, 1L),
        s"p=$p must be the exact order statistic")
    }
  }

}
