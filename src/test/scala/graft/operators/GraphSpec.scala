package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: the same integer fixed-point recurrence,
    * computed single-threaded on driver maps. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          damp: Long = 85L, base: Long = 1000000L): Map[Long, Long] = {
    val e = edges.distinct
    val outd = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = e.map(_._1).distinct
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val inbox = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (s, d) => inbox(d) += r(s) / outd(s) }
      r = nodes.map(n => n -> (base * (100 - damp) / 100 + damp * inbox(n) / 100)).toMap
    }
    r
  }

  private val diamond = Seq[(Long, Long)](
    (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 1L))

  test("pageRank matches the integer reference on a hand graph") {
    val got = Graph.pageRank(diamond.toDF("src", "dst"), "src", "dst", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === refPageRank(diamond, iters = 4))
    // hub 4 (two in-edges) outranks the single-in-edge spokes
    assert(got(4L) > got(2L) && got(2L) === got(3L))
  }

  test("pageRank is partitioning-invariant (integer math has no order tail)") {
    val df = diamond.toDF("src", "dst")
    val a = Graph.pageRank(df, "src", "dst", iters = 6, checkpointEvery = 2)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(df.repartition(7, col("dst")), "src", "dst", iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("multi-edges count once and in-degree-0 nodes keep teleport mass") {
    // 5→6 duplicated; 5 has no in-edges (but an out-edge, per the contract)
    val e = Seq[(Long, Long)]((5L, 6L), (5L, 6L), (6L, 5L), (6L, 7L), (7L, 6L))
    val got = Graph.pageRank(e.toDF("src", "dst"), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === refPageRank(e, iters = 3))
    assert(got.keySet === Set(5L, 6L, 7L))
  }

  test("rank mass stays conserved to within floor-division loss") {
    val got = Graph.pageRank(diamond.toDF("src", "dst"), "src", "dst", iters = 3)
      .agg(sum($"pr")).as[Long].head()
    val full = 4L * 1000000L
    // each iteration can only LOSE mass (floor division), never create it
    assert(got <= full && got > full * 95 / 100)
  }
}
