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
