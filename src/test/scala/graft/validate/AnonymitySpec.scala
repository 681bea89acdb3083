package graft.validate

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  private val release = Seq(
    // (zip, age_band, diagnosis) — the classic quasi-id + sensitive shape
    ("02139", "30s", "flu"), ("02139", "30s", "flu"), ("02139", "30s", "cold"),
    ("02139", "40s", "flu"), // k=1 group
    ("94105", "20s", "flu"), ("94105", "20s", "flu"), ("94105", "20s", "flu"),
    ("94105", "30s", null), ("94105", "30s", "flu"))
    .toDF("zip", "age", "dx")

  private def audit(k: Long, minL: Long = 2L) =
    Anonymity.kAnonymityAudit(release, Seq("zip", "age"), col("dx"), k, minL)
      .orderBy(col("zip"), col("age")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

  test("group sizes, l-diversity, and risk flags on a hand fixture") {
    assert(audit(k = 2) === Seq(
      ("02139", "30s", 3L, 2L, false),
      ("02139", "40s", 1L, 1L, true), // breaks both gates
      ("94105", "20s", 3L, 1L, true), // k fine, 1-diverse leaks dx
      ("94105", "30s", 2L, 2L, false))) // NULL counts as a value
  }

  test("raising k flips exactly the groups below the new threshold") {
    val flipped = audit(k = 3).map(t => (t._1, t._2, t._5))
    assert(flipped === Seq(
      ("02139", "30s", false), ("02139", "40s", true),
      ("94105", "20s", true), ("94105", "30s", true)))
  }

  test("summary carries the release-gate headline numbers") {
    val s = Anonymity.auditSummary(
      Anonymity.kAnonymityAudit(release, Seq("zip", "age"), col("dx"), 2L))
      .collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3),
      s.getLong(4)) === ((4L, 2L, 4L, 1L, 1L)))
  }

  test("audit equals a brute-force recount on the sf0.001 customer table") {
    val c = spark.read.parquet(s"${testDataDir()}/customer.parquet")
    val out = Anonymity.kAnonymityAudit(c, Seq("c_nationkey", "c_mktsegment"),
        expr("cast(floor(c_acctbal / 1000) as bigint)"), k = 10L)
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val rows = c.select(col("c_nationkey"), col("c_mktsegment"),
        expr("cast(floor(c_acctbal / 1000) as bigint)")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val brute = rows.groupBy(t => (t._1, t._2)).map { case (g, rs) =>
      g -> (rs.size.toLong, rs.map(_._3).distinct.size.toLong)
    }
    assert(out.keySet === brute.keySet)
    brute.foreach { case (g, (n, l)) =>
      assert(out(g) === ((n, l, n < 10 || l < 2)), s"group $g")
    }
  }

  test("generalization fixpoint: picks the first level whose min group hits k") {
    // values 0..15 in one segment, base bucket 1: level-0 groups are
    // singletons; level L groups have 2^L rows -> k=4 fixes at level 2
    val df = (0L to 15L).map(v => ("s", v)).toDF("seg", "v")
    val out = Anonymity.generalizeNumericToK(df, Seq("seg"), col("v"),
        baseBucket = 1L, k = 4L)
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getInt(4)))
    assert(out === Seq((0L, 4L, false, 2), (1L, 4L, false, 2),
      (2L, 4L, false, 2), (3L, 4L, false, 2)))
  }

  test("generalization: negative values floor (not truncate) across levels") {
    // -1 and -2 at base 1: b0 = -1,-2; level 1 buckets floor(-1/2) = -1,
    // floor(-2/2) = -1 -> they MERGE (truncation would send -1 to 0)
    val df = Seq(("s", -1L), ("s", -2L)).toDF("seg", "v")
    val out = Anonymity.generalizeNumericToK(df, Seq("seg"), col("v"),
        baseBucket = 1L, k = 2L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(out.toSeq === Seq((-1L, 2L, 1)))
  }

  test("generalization: unreachable k caps at maxLevels and suppresses") {
    // two segments: 'big' has 8 rows, 'tiny' 1 row — k=4 is unreachable
    // for 'tiny' at ANY level, so the search caps and flags it
    val df = ((1L to 8L).map(v => ("big", v)) :+ (("tiny", 1L))).toDF("seg", "v")
    val out = Anonymity.generalizeNumericToK(df, Seq("seg"), col("v"),
        baseBucket = 1L, k = 4L, maxLevels = 5)
      .orderBy(col("seg")).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3), r.getInt(4)))
    assert(out === Seq(("big", 8L, false, 5), ("tiny", 1L, true, 5)))
  }

  test("generalization min group size is monotone in the level (rollup sanity)") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(300)(("s", rnd.nextInt(2000).toLong - 500L)).toDF("seg", "v")
    val mins = (0 to 8).map { l =>
      df.groupBy(expr(s"shiftright(cast(floor(v / 10) as bigint), $l)"))
        .count().agg(min("count")).collect()(0).getLong(0)
    }
    assert(mins === mins.sorted,
      "coarser levels must never shrink the minimum group")
  }

  test("contract violations are rejected") {
    intercept[IllegalArgumentException] {
      Anonymity.kAnonymityAudit(release, Seq.empty, col("dx"), 2L)
    }
    intercept[IllegalArgumentException] {
      Anonymity.kAnonymityAudit(release, Seq("zip"), col("dx"), 0L)
    }
  }
}
