package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustOutliersSpec extends SparkSpec {

  test("median/MAD flags the planted tail cluster a z-score gate misses") {
    val s = spark; import s.implicits._
    // bulk: 1..99; contamination: TEN points at 1000 plus one at -900 —
    // enough mass to inflate the stddev past its own detection threshold
    // (the masking effect), while median/MAD barely move (50% breakdown)
    val df = ((1 to 99).map(i => (i.toLong, i.toDouble)) ++
      (0 until 10).map(j => (1000L + j, 1000.0)) :+ (1100L, -900.0))
      .toDF("id", "v")
    val got = Profiler.robustOutliers(df, "id", "v", k = 3.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(got.keySet === ((1000L until 1010L).toSet + 1100L),
      s"flagged: ${got.keySet}")
    assert(got(1000L) === true && got(1100L) === false)
    // the masking invariant: the SAME contamination makes the naive
    // z-score gate blind to the 1000-cluster
    val stats = df.agg(avg(col("v")).as("m"),
      stddev_pop(col("v")).as("s")).head()
    val (m, sd) = (stats.getDouble(0), stats.getDouble(1))
    assert(math.abs(1000.0 - m) < 3.5 * sd,
      "fixture invariant: the naive z-score gate must miss the cluster")
  }

  test("no outliers on uniform data") {
    val s = spark; import s.implicits._
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    assert(Profiler.robustOutliers(df, "id", "v").count() === 0L)
  }

  test("MAD = 0 fails loudly instead of flagging every deviating row") {
    val s = spark; import s.implicits._
    // 60% zeros → median 0, MAD 0: the k*MAD gate is undefined here
    val df = ((1 to 60).map(i => (i.toLong, 0.0)) ++
      (61 to 100).map(i => (i.toLong, 1.0))).toDF("id", "v")
    val e = intercept[Exception] {
      Profiler.robustOutliers(df, "id", "v").collect()
    }
    assert(e.getMessage.contains("MAD is 0") ||
      Option(e.getCause).exists(_.getMessage.contains("MAD is 0")))
  }

  test("PSI: an entirely empty slice fails loudly, not NULL/Infinity") {
    val s = spark; import s.implicits._
    val df = (1 to 20).map(i => ("ref", i.toDouble)).toDF("slice", "v")
    val e = intercept[Exception] {
      Profiler.driftPsi(df, "slice", "ref", "cur", "v", Seq(10.0)).collect()
    }
    assert(e.getMessage.contains("current slice is empty") ||
      Option(e.getCause).exists(_.getMessage.contains("current slice is empty")))
  }

  test("PSI: identical slices score ~0, a genuine shift scores > 0.25") {
    val s = spark; import s.implicits._
    val bounds = Seq(10.0, 20.0, 30.0)
    // ref uniform over bins; cur identical → PSI 0 exactly
    val same = ((1 to 40).map(i => ("ref", (i % 4) * 10 + 5.0)) ++
      (1 to 40).map(i => ("cur", (i % 4) * 10 + 5.0))).toDF("slice", "v")
    val psi0 = Profiler.driftPsi(same, "slice", "ref", "cur", "v", bounds)
      .agg(sum(col("psi_term"))).head().getDouble(0)
    assert(psi0 === 0.0)
    // cur mass shifted hard into the top bin → major drift
    val shifted = ((1 to 40).map(i => ("ref", (i % 4) * 10 + 5.0)) ++
      (1 to 40).map(i => ("cur", if (i % 10 == 0) 5.0 else 35.0)))
      .toDF("slice", "v")
    val rows = Profiler.driftPsi(shifted, "slice", "ref", "cur", "v", bounds)
      .collect()
    // bins 1 and 2 lost ALL current mass → undefined terms surface as null
    assert(rows.filter(r => r.getLong(0) == 1L || r.getLong(0) == 2L)
      .forall(_.isNullAt(5)), "emptied bins must yield NULL, not a number")
    val psi = rows.filter(!_.isNullAt(5)).map(_.getDouble(5)).sum
    assert(psi > 0.25, s"major shift must exceed 0.25, got $psi")
  }
}
