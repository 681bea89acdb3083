package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  // two tight blobs far apart: k-means must separate them regardless of init
  private def blobs = {
    val s = spark; import s.implicits._
    val a = (0L to 9L).map(i => (i, Array(10.0 + 0.01 * i, 10.0)))
    val b = (10L to 19L).map(i => (i, Array(-10.0, -10.0 - 0.01 * i)))
    (a ++ b).toDF("id", "vec")
  }

  test("separates two obvious blobs; d2 is the distance to the final centroid") {
    val out = KMeansOp.lloyd(blobs, "id", "vec", k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toList
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.toSet === Set((0L to 9L).toSet, (10L to 19L).toSet),
      s"blobs must land in separate clusters: $byCluster")
    // a tight blob's members sit within its diameter of the centroid
    assert(out.forall(_._3 < 0.1), s"intra-blob d2 must be tiny: $out")
  }

  test("deterministic across repartitioning") {
    val base = KMeansOp.lloyd(blobs, "id", "vec", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val re = KMeansOp.lloyd(blobs.repartition(7), "id", "vec", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(base === re)
  }

  test("loud gate: ragged and null-element vectors fail fast") {
    val s = spark; import s.implicits._
    val ragged = Seq((1L, Array(1.0, 2.0)), (2L, Array(1.0))).toDF("id", "vec")
    val e1 = intercept[IllegalArgumentException] {
      KMeansOp.lloyd(ragged, "id", "vec", k = 1, iters = 1)
    }
    assert(e1.getMessage.contains("ragged"))
    val nulls = Seq((1L, Array[java.lang.Double](1.0, 2.0)),
      (2L, Array[java.lang.Double](1.0, null))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      KMeansOp.lloyd(nulls, "id", "vec", k = 1, iters = 1)
    }
  }

  test("quantization-overflow values (|x| >= 1000) fail fast, not poison") {
    val s = spark; import s.implicits._
    val big = Seq((1L, Array(1.0, 2.0)), (2L, Array(1e6, 0.0))).toDF("id", "vec")
    // ANSI mode throws on the decimal(9,6) overflow at the quantize
    // projection — loud either way, never a silent wrong cluster
    val e = intercept[Exception] {
      KMeansOp.lloyd(big, "id", "vec", k = 1, iters = 1)
    }
    assert(e.getClass.getSimpleName.contains("Arithmetic")
        || e.getMessage.contains("overflow"),
      s"unexpected failure shape: $e")
  }

  test("k = n degenerates to one point per cluster with d2 = 0") {
    val s = spark; import s.implicits._
    val pts = Seq((1L, Array(0.0, 0.0)), (2L, Array(5.0, 5.0)),
      (3L, Array(-5.0, 5.0))).toDF("id", "vec")
    val out = KMeansOp.lloyd(pts, "id", "vec", k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.map(_._2).distinct.length === 3, "each point its own cluster")
    assert(out.forall(_._3 === 0.0))
  }
}
