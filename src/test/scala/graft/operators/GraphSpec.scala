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

  /** Brute-force triangle reference: all node triples, count pairwise
    * adjacency in the deduplicated undirected graph. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: Long, b: Long) = und.contains((math.min(a, b), math.max(a, b)))
    val triples = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      if adj(nodes(i), nodes(j)) && adj(nodes(j), nodes(k)) && adj(nodes(i), nodes(k))
    } yield Seq(nodes(i), nodes(j), nodes(k))
    val counts = triples.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    nodes.map(n => n -> counts.getOrElse(n, 0L)).toMap
  }

  test("triangleCounts matches brute force on a mixed graph") {
    // K4 on 1-4 (every node in 3 triangles) + a pendant 5 + a star center 6
    // with leaves 7,8 (no closure) + the 4-cycle 9-10-11-12 (no triangles)
    val e = Seq[(Long, Long)](
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L), (6L, 8L),
      (9L, 10L), (10L, 11L), (11L, 12L), (12L, 9L))
    val got = Graph.triangleCounts(e.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got === refTriangles(e))
    assert(got(1L) === 3L && got(5L) === 0L && got(6L) === 0L && got(9L) === 0L)
  }

  test("trusted-input flags are identity on distinct/symmetric frames") {
    // the shared-frame registry path sets edgesDeduped /
    // edgesSymmetricDeduped on pre-distinct symmetric frames; outputs
    // must be bit-identical to the flag-off defaults
    val raw = Seq.tabulate(60)(i => ((i % 10).toLong * 2, (i % 7).toLong * 2 + 1))
    val sym = (raw ++ raw.map(_.swap)).distinct.toDF("src", "dst")
      .localCheckpoint()
    val pr0 = Graph.pageRank(sym, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val pr1 = Graph.pageRank(sym, "src", "dst", iters = 3,
      edgesDeduped = true).as[(Long, Long)].collect().toMap
    assert(pr0 === pr1)
    val lp0 = Graph.labelPropagation(sym, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val lp1 = Graph.labelPropagation(sym, "src", "dst", iters = 3,
      edgesSymmetricDeduped = true).as[(Long, Long)].collect().toMap
    assert(lp0 === lp1)
    val seeds = Seq(0L, 4L).toDF("seed")
    val bf0 = Graph.bfsDistances(sym, "src", "dst", seeds, "seed", maxHops = 3)
      .as[(Long, Int)].collect().toMap
    val bf1 = Graph.bfsDistances(sym, "src", "dst", seeds, "seed",
      maxHops = 3, edgesDeduped = true).as[(Long, Int)].collect().toMap
    assert(bf0 === bf1)
  }

  test("triangleRowsOf: edge-iterator rows keep the wedge-join contract") {
    // each triangle exactly ONCE as (ta, tb, c) with c the ≺-minimal
    // corner (deg-then-id order) and ta ≺ tb — the row identity the
    // DOULION gate and the corner counts both lean on. Graph: K4 on 1-4
    // plus a pendant 5 on node 4 (so degrees differ: d(1)=d(2)=d(3)=3,
    // d(4)=4, and every K4 triangle orients away from its two smallest
    // members).
    val e = Seq[(Long, Long)](
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val und = Graph.canonicalUndirected(e.toDF("src", "dst"), "src", "dst")
    val rows = Graph.triangleRowsOf(und)
      .as[(Long, Long, Long)].collect().toSet
    // ≺ order here: 5 (deg 1) ≺ 1 ≺ 2 ≺ 3 (deg 3, id ties) ≺ 4 (deg 4).
    // Triangles {1,2,3}, {1,2,4}, {1,3,4}, {2,3,4}; each centered at its
    // ≺-min corner with (ta, tb) in ≺ order:
    assert(rows === Set((2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L),
      (3L, 4L, 2L)))
  }

  test("triangleCounts: direction, multi-edges and self-loops are ignored") {
    // triangle 1-2-3 given with mixed directions, a duplicate reversed
    // edge, and a self-loop; each triangle must count once per corner
    val e = Seq[(Long, Long)](
      (1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (2L, 2L))
    val got = Graph.triangleCounts(e.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts is partitioning-invariant on a random graph") {
    val rnd = new scala.util.Random(7)
    val e = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val df = e.toDF("src", "dst")
    val a = Graph.triangleCounts(df, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val b = Graph.triangleCounts(df.repartition(13, col("src")), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a === refTriangles(e))
    assert(a.values.sum % 3 === 0L, "every triangle credits exactly 3 corners")
  }

  test("triangleEstimate: p=100 is exact, unbiased shape at p=50") {
    val rnd = new scala.util.Random(11)
    val e = Seq.fill(400)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
    val df = e.toDF("src", "dst")
    val exact = refTriangles(e).values.sum / 3
    // p = 100 keeps every edge: the "estimate" must equal the exact count
    val full = Graph.triangleEstimate(df, "src", "dst", pPct = 100)
      .select($"est_triangles", $"sampled_triangles").as[(Double, Long)].head()
    assert(full._1 === exact.toDouble && full._2 === exact)
    // p = 50: deterministic hash sample, so the estimate is stable across
    // runs and partitionings; and the 6σ gate must hold
    val est1 = Graph.triangleEstimate(df, "src", "dst", pPct = 50)
      .select($"est_triangles").as[Double].head()
    val est2 = Graph.triangleEstimate(df.repartition(9, col("dst")),
        "src", "dst", pPct = 50)
      .select($"est_triangles").as[Double].head()
    assert(est1 === est2, "hash-deterministic sample must not vary")
    assert(Graph.triangleEstimateViolations(df, "src", "dst", pPct = 50)
      .count() === 0L)
    // the gate re-derives the sampled count by coin-filtering the EXACT
    // triangle rows (one wedge join) — that filter must agree bit-exactly
    // with triangleEstimate's own sampled wedge join for every p
    for (pp <- Seq(10, 37, 50, 80)) {
      val direct = Graph.triangleEstimate(df, "src", "dst", pPct = pp)
        .select($"sampled_triangles").as[Long].head()
      val und = Graph.canonicalUndirected(df, "src", "dst")
      // the SAME Knuth-multiplicative coin the engine flips (and the
      // DuckDB oracle replays in BIGINT SQL)
      val rederived = Graph.triangleRowsOf(und)
        .filter(
          Graph.edgeCoinSlot(least($"ta", $"tb"), greatest($"ta", $"tb")) < pp.toLong &&
          Graph.edgeCoinSlot(least($"ta", $"c"), greatest($"ta", $"c")) < pp.toLong &&
          Graph.edgeCoinSlot(least($"tb", $"c"), greatest($"tb", $"c")) < pp.toLong)
        .count()
      assert(direct === rederived,
        s"p=$pp: coin-filtered exact triangles must equal the sampled count")
    }
  }

  test("triangleEstimate violation gate trips on a rigged estimate") {
    // sanity that the gate CAN fail: a triangle-free graph (star) has
    // T = 0 and k = 0 → bound 0; any nonzero estimate would violate. With
    // T = 0 every sample is also 0, so instead check the bound arithmetic
    // directly on a tiny triangle where we force p so low the sample
    // drops the triangle: est = 0 vs T = 1 must still sit INSIDE 6σ
    // (variance 1/p³−1 is huge at small p) — i.e. the gate is calibrated,
    // not vacuous-tight.
    val tri = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.triangleEstimateViolations(tri, "src", "dst", pPct = 10)
      .count() === 0L)
    // and an empty graph yields no violation row (no spurious marker)
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.triangleEstimateViolations(empty, "src", "dst", pPct = 50)
      .count() === 0L)
  }

  /** Reference batch peeling: round each node falls, -1 = core. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var alive = und.flatMap(e => Seq(e._1, e._2)).toSet
    var result = Map.empty[Long, Int]
    var round = 0
    var changed = true
    while (changed) {
      val deg = alive.map(v => v -> und.count(e =>
        (e._1 == v && alive(e._2)) || (e._2 == v && alive(e._1)))).toMap
      val falls = alive.filter(deg(_) < k)
      changed = falls.nonEmpty
      if (changed) {
        result ++= falls.map(_ -> round)
        alive --= falls
        round += 1
      }
    }
    result ++ alive.map(_ -> -1)
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] =
    Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("kCore: hand graphs — clique all-core, chain peels from the ends") {
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    assert(runKCore(clique, 4) == (1L to 5L).map(_ -> -1).toMap)
    // chain 1-2-3-4, k=2: endpoints fall round 0, the middle round 1
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(runKCore(chain, 2) ==
      Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1))
    // k=1: every node of an edge has degree >= 1 -> all core
    assert(runKCore(chain, 1) == Map(1L -> -1, 2L -> -1, 3L -> -1, 4L -> -1))
  }

  test("kCore equals brute-force peeling on random graphs, rounds and all") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2)
      for (k <- Seq(2, 3, 5)) {
        assert(runKCore(edges, k) == refKCore(edges, k),
          s"seed=$seed k=$k diverged from reference peeling")
      }
    }
  }

  test("kCore certificate gate: clean on real output, trips on corruption") {
    val rnd = new scala.util.Random(9)
    // sparse enough that the 3-core is a PROPER subgraph: the fixture
    // must exercise both removed and core nodes
    val edges = Seq.fill(55)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val assign = Graph.kCore(df, "src", "dst", 3)
    val byKind = assign.groupBy(col("round") === -1).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byKind.getOrElse(true, 0L) > 0 && byKind.getOrElse(false, 0L) > 0,
      s"fixture must have both core and removed nodes: $byKind")
    assert(Graph.kCoreViolations(df, "src", "dst", 3, assign).count() === 0L)
    // corrupt: claim some removed node is core -> SURVIVED (or REMOVABLE
    // on its neighbors) must fire
    val someRemoved = assign.filter(col("round") >= 0)
      .orderBy(col("node")).limit(1).collect()(0).getLong(0)
    val corrupted = assign
      .withColumn("round", when(col("node") === someRemoved, lit(-1))
        .otherwise(col("round")))
    assert(Graph.kCoreViolations(df, "src", "dst", 3, corrupted).count() > 0L,
      "certificate failed to catch a forged core membership")
    // corrupt: drop a node entirely -> coverage must fire
    val dropped = assign.filter(col("node") =!= someRemoved)
    assert(Graph.kCoreViolations(df, "src", "dst", 3, dropped)
      .filter(col("issue") === "coverage").count() > 0L)
  }

  /** Brute-force reference BFS: Dijkstra-free frontier expansion on
    * driver maps, horizon-capped. */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
                     maxHops: Int): Map[Long, Int] = {
    val adj = edges.distinct.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to maxHops if frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h)
      frontier = next
    }
    dist
  }

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int) =
    Graph.bfsDistances(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("seed"), "seed", maxHops)
      .as[(Long, Int)].collect().toMap

  test("bfsDistances: hand graph — chain distances, horizon cap, unreached") {
    // 1→2→3→4→5 plus a detached 8→9; seed at 1
    val e = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    assert(bfs(e, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(bfs(e, Seq(1L), 10) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    assert(bfs(e, Seq(1L), 0) === Map(1L -> 0))
  }

  test("bfsDistances: multi-source takes the min over seeds; shortcut wins") {
    // ring 1→2→3→4→1 with shortcut 1→3; seeds 1 and 4
    val e = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    assert(bfs(e, Seq(1L, 4L), 3) ===
      Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1))
  }

  test("bfsDistances equals the reference on random graphs") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 5) {
      val n = 30
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val seeds = Seq.fill(3)(rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(5)
      assert(bfs(edges, seeds, hops) === refBfs(edges, seeds.toSet, hops),
        s"trial $trial (hops=$hops, seeds=$seeds)")
    }
  }

  /** Brute-force reference LPA: synchronous rounds on driver maps, same
    * (count DESC, label ASC) argmax. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (a, b) => a != b }.distinct
    val adj = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lab).map { case (l, xs) => l -> xs.size }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int) =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("labelPropagation: two cliques with a bridge settle into two labels") {
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val e = cliqueA ++ cliqueB ++ Seq((4L, 11L))
    val got = lpa(e, 4)
    assert(got === refLpa(e, 4))
    // each clique is internally uniform; the two communities differ
    assert((1L to 4L).map(got).toSet.size === 1)
    assert((11L to 14L).map(got).toSet.size === 1)
    assert(got(1L) !== got(14L))
  }

  test("labelPropagation ties break toward the smallest label") {
    // path 5—6—7: node 6 sees labels {5, 7} once each → takes 5
    val got1 = lpa(Seq((5L, 6L), (6L, 7L)), 1)
    assert(got1(6L) === 5L)
    // endpoints see only 6
    assert(got1(5L) === 6L && got1(7L) === 6L)
  }

  test("labelPropagation equals the reference on random graphs") {
    val rnd = new scala.util.Random(926)
    for (trial <- 1 to 5) {
      val n = 24
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val iters = 1 + rnd.nextInt(4)
      assert(lpa(edges, iters) === refLpa(edges, iters),
        s"trial $trial (iters=$iters)")
    }
  }

  test("bfsDistances: seed-only graph with no outgoing edges terminates") {
    val e = Seq[(Long, Long)]((10L, 11L))
    // seed 99 has no edges at all: saturates immediately, distance map = seed
    assert(bfs(e, Seq(99L), 4) === Map(99L -> 0))
  }

  /** Brute-force reference: full Bellman-Ford, `rounds` relaxations. */
  private def refBellmanFord(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
                             rounds: Int): Map[Long, Long] = {
    val e = edges.groupBy(t => (t._1, t._2))
      .map { case ((s, d), ts) => (s, d, ts.map(_._3).min) }.toSeq
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val cand = e.flatMap { case (s, d, w) => dist.get(s).map(c => d -> (c + w)) }
      dist = (dist.toSeq ++ cand).groupBy(_._1)
        .map { case (n, vs) => n -> vs.map(_._2).min }
    }
    dist
  }

  private def wsp(edges: Seq[(Long, Long, Long)], seeds: Seq[Long], rounds: Int) =
    Graph.weightedDistances(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        seeds.toDF("seed"), "seed", rounds)
      .as[(Long, Long)].collect().toMap

  test("weightedDistances: cheap long route beats expensive direct edge") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5 — needs 2 rounds to win
    val e = Seq[(Long, Long, Long)]((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(wsp(e, Seq(1L), 1) === Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    assert(wsp(e, Seq(1L), 2) === Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("weightedDistances: multi-edges collapse to min weight; multi-source min") {
    val e = Seq[(Long, Long, Long)]((1L, 2L, 9L), (1L, 2L, 4L), (5L, 2L, 3L))
    assert(wsp(e, Seq(1L, 5L), 3) === Map(1L -> 0L, 5L -> 0L, 2L -> 3L))
  }

  test("weightedDistances equals full Bellman-Ford on random weighted graphs") {
    val rnd = new scala.util.Random(412)
    for (trial <- 1 to 5) {
      val n = 25
      val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        1L + rnd.nextInt(9))).filter(t => t._1 != t._2)
      val seeds = Seq.fill(2)(rnd.nextInt(n).toLong).distinct
      val rounds = 1 + rnd.nextInt(5)
      assert(wsp(edges, seeds, rounds) ===
        refBellmanFord(edges, seeds.toSet, rounds),
        s"trial $trial (rounds=$rounds, seeds=$seeds)")
    }
  }
}
