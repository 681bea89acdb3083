package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorStatsSpec extends SparkSpec {

  test("centroidSums: fixed-point sums, invariant under repartitioning") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f, 4.0f)),
      (0, Array(3.0f, 0.5f, 0.25f)),
      (1, Array(-1.0f, 0.0f, 8.0f))
    ).toDF("label", "embedding")
    val got = VectorStats.centroidSums(df, "label", "embedding")
      .orderBy("label", "pos")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0, 1L, 4000000L, 2L, 2.0), (0, 2L, 2500000L, 2L, 1.25),
      (0, 3L, 4250000L, 2L, 2.125),
      (1, 1L, -1000000L, 1L, -1.0), (1, 2L, 0L, 1L, 0.0),
      (1, 3L, 8000000L, 1L, 8.0)))
    // long addition is order-independent: any partition layout, same bits
    val a = VectorStats.centroidSums(df.repartition(7), "label", "embedding")
      .orderBy("label", "pos").collect().map(_.toSeq).toSeq
    val b = VectorStats.centroidSums(df.coalesce(1), "label", "embedding")
      .orderBy("label", "pos").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("gramSums: hand-computed upper triangle, invariant under repartitioning") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Array(1.0f, 2.0f)),
      Tuple1(Array(3.0f, -1.0f))).toDF("embedding")
    val got = VectorStats.gramSums(df, "embedding")
      .orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.math.BigDecimal](2).longValueExact(), r.getLong(3)))
    // (0,0): 1+9=10; (0,1): 2-3=-1; (1,1): 4+1=5 — times 1e6
    assert(got.toSeq === Seq(
      (0L, 0L, 10000000L, 2L), (0L, 1L, -1000000L, 2L), (1L, 1L, 5000000L, 2L)))
    val a = VectorStats.gramSums(df.repartition(5), "embedding")
      .orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.math.BigDecimal](2).longValueExact(), r.getLong(3))).toSeq
    assert(a === got.toSeq)
  }

  test("jacobiEigen recovers a known symmetric spectrum") {
    // A = [[2,1],[1,2]] → eigenvalues 3 (along [1,1]) and 1 (along [1,-1])
    val (evals, evecs) = VectorStats.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = evals.indices.sortBy(i => -evals(i))
    assert(math.abs(evals(order(0)) - 3.0) < 1e-9)
    assert(math.abs(evals(order(1)) - 1.0) < 1e-9)
    val top = evecs(order(0))
    assert(math.abs(math.abs(top(0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(top(0) - top(1)) < 1e-9, "top eigenvector must be along [1,1]")
  }

  test("pcaComponents: orthonormal, variance-ordered, matches JVM reference") {
    import spark.implicits._
    // 2D structure embedded in 4D: x along dims (0,2), small noise on 1
    val rows = (0 until 40).map { n =>
      val x = (n % 10).toFloat
      Tuple1(Array(x, (n % 3).toFloat * 0.1f, 2.0f * x, 7.0f))
    }
    val df = rows.toDF("embedding")
    val (mean, evals, comps) = VectorStats.pcaComponents(df, "embedding", k = 3)
    assert(mean.length === 4 && comps.length === 3)
    assert(evals.sorted(Ordering[Double].reverse).toSeq === evals.toSeq)
    // orthonormal rows
    for (a <- comps.indices; b <- comps.indices) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8, s"($a,$b)")
    }
    // top component captures the (1,0,2,0)/sqrt(5) direction
    val t = comps(0)
    assert(math.abs(math.abs(t(0)) - 1.0 / math.sqrt(5)) < 1e-3)
    assert(math.abs(math.abs(t(2)) - 2.0 / math.sqrt(5)) < 1e-3)
    // constant dim 3 contributes no variance anywhere significant
    assert(math.abs(t(3)) < 1e-6)
    // JVM covariance reference: eigenvalue sum == trace
    val data = rows.map(_._1.map(_.toDouble))
    val mu = Array.tabulate(4)(j => data.map(_(j)).sum / data.length)
    val trace = (0 until 4).map(j =>
      data.map(v => (v(j) - mu(j)) * (v(j) - mu(j))).sum / data.length).sum
    val (allEvals, _) = (VectorStats.pcaComponents(df, "embedding", k = 4)._2, ())
    assert(math.abs(allEvals.sum - trace) < 1e-6, "eigenvalue sum must equal trace")
  }

  test("pcaProject: projections match driver-side reference dot products") {
    import spark.implicits._
    val rows = (0 until 20).map(n =>
      (n.toLong, Array(n.toFloat, (20 - n).toFloat, 1.5f * n)))
    val df = rows.toDF("vec_id", "embedding")
    val (mean, _, comps) = VectorStats.pcaComponents(df, "embedding", k = 2)
    val got = VectorStats.pcaProject(df, "embedding", "proj", k = 2)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    for ((id, vec) <- rows) {
      val want = comps.map(c =>
        c.zip(vec.map(_.toDouble).zip(mean).map { case (v, m) => v - m })
          .map { case (ci, vi) => ci * vi }.sum)
      val g = got(id)
      for (i <- want.indices)
        assert(math.abs(g(i) - want(i)) < 1e-9, s"id $id comp $i")
    }
  }

  test("normOutliers flags exactly the extreme-norm vectors") {
    import spark.implicits._
    // 100 unit-ish vectors + one near-zero + one huge
    val rows = (0L until 100L).map(i => (i, Array(1.0f, (1 + (i % 7) * 0.001).toFloat))) ++
      Seq((100L, Array(0.001f, 0.001f)), (101L, Array(50.0f, 50.0f)))
    val out = VectorStats.normOutliers(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", lowPct = 0.01, highPct = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out(100L) === ((true, false)), "near-zero vector must flag low")
    assert(out(101L) === ((false, true)), "huge vector must flag high")
    assert((0L until 100L).forall(i => out(i) == ((false, false))),
      "normal vectors must not flag")
  }

  test("centroids: per-label mean vector matches fixed-point means on the fixture") {
    val emb = spark.read.parquet(s"${testDataDir("0.01")}/embeddings.parquet")
    val cents = VectorStats.centroids(emb, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val sums = VectorStats.centroidSums(emb, "label", "embedding")
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(4))).toMap
    assert(cents.keySet == sums.keySet)
    // fixed-point floor error per element < 1e-6 → mean gap < 1e-6
    for ((label, mean) <- sums; (got, want) <- cents(label).zip(mean))
      assert(math.abs(got - want) < 1e-5, s"label $label")
    // every centroid has the fixture's full dimensionality
    assert(cents.values.forall(_.length == 64))
  }
}
