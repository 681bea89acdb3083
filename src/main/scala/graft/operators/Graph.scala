package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph ranking over an edge list — the link-analysis half of
  * a web-scale corpus pipeline (rank pages before quality filtering; weight
  * sources in the mixing stage by their link authority).
  *
  * PageRank here is FIXED-POINT integer arithmetic, not floating-point:
  * rank mass is carried in micro-units (`base` = 1.0 of mass) and every
  * per-iteration operation is a long floor-division or a long sum — both
  * exactly associative/commutative, so the result is bit-identical across
  * partitionings, engines, and aggregation orders. That turns an
  * "approximately converged" iterative algorithm into an exactly oracled
  * one: DuckDB replays the same iterations with BIGINT `//` math and the
  * hashes must match. (The usual double-precision PageRank is
  * order-dependent in its low bits and can never be hash-compared.)
  *
  * Scale posture (100 TB): per iteration ONE shuffle join (edges ⋈ ranks on
  * src — ranks is |V| rows vs |E| edges, so AQE broadcasts it whenever the
  * node set fits) and ONE dst-keyed partial-aggregated sum. The rank frame
  * is eagerly checkpointed every `checkpointEvery` iterations to truncate
  * lineage (same idiom as [[Dedup.connectedComponents]]): without it the
  * optimizer re-analyzes a plan that doubles per round. Nothing touches the
  * driver; the output is |V| rows.
  *
  * Contract: every node must have at least one OUT-edge (no dangling-mass
  * redistribution is performed — callers with dangling nodes add self-loops
  * or drop sinks first). Bipartite co-occurrence graphs built symmetrically
  * (a→b and b→a) satisfy this by construction.
  */
object Graph {

  /** 3-iteration damped PageRank in exact integer micro-units.
    *
    * new_rank(v) = base·(100−damp)/100  +  damp · Σ_{u→v} (rank(u) div outdeg(u)) div 100
    *
    * @param edges  edge list; deduplicated internally (multi-edges count once)
    * @param damp   damping factor in percent (85 = the classic 0.85)
    * @param base   integer mass of rank 1.0 (micro-units)
    * @return (node, pr) — one row per node with out-edges, `pr` in micro-units
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damp: Long = 85L, base: Long = 1000000L,
               checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1 && damp >= 0 && damp <= 100 && base > 0)
    val spark = edges.sparkSession
    val reliableCkpt = spark.sparkContext.getCheckpointDir.isDefined
    def materialized(df: DataFrame): DataFrame =
      if (reliableCkpt) df.checkpoint() else df.localCheckpoint()

    // Edge list with the source's out-degree attached ONCE — reused by every
    // iteration, so materialize it (the distinct + degree agg should run one
    // time, not `iters` times).
    val e = edges.select(col(srcCol).cast("long").as("src"),
                         col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outd"))
    val eDeg = materialized(e.join(deg, "src"))
    val nodes = materialized(eDeg.select(col("src").as("node")).distinct())

    val teleport = lit(base * (100L - damp) / 100L)
    var ranks = nodes.withColumn("pr", lit(base))
    for (i <- 1 to iters) {
      val contrib = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst"), expr("pr div outd").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      // left join keeps in-degree-0 nodes at pure teleport mass
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (teleport + expr(s"($damp * coalesce(s, 0L)) div 100")).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = materialized(ranks)
    }
    ranks
  }

  /** Exact per-node triangle counts by degree-ordered edge orientation
    * (Chiba–Nishizeki; the MapReduce formulation is Suri & Vassilvitskii,
    * WWW'11 "node-iterator++"). Triangles are the unit of local clustering
    * — the graph-quality signal a link-graph corpus pipeline uses to
    * separate organic neighborhoods (high closure) from spam farms and
    * scraper link rings (star-shaped, closure ≈ 0).
    *
    * Every edge {u,v} is oriented from its lower endpoint in the total
    * order `a ≺ b  iff  deg(a) < deg(b) or (deg(a) = deg(b) and a < b)`.
    * Each triangle {a,b,c} then materializes exactly once: as the wedge
    * (c→a, c→b) centered at its ≺-minimal corner plus the closing oriented
    * edge a→b. Orientation is what makes this scale: a node's OUT-degree
    * after orienting is O(√m) on any graph (its out-neighbors all have
    * degree ≥ its own), so the wedge join's fan-out per center is bounded
    * by √m instead of the raw max degree — the classic guard against the
    * celebrity-node quadratic blowup.
    *
    * Exactness: counting only — no floating point anywhere — so the result
    * is engine- and partitioning-independent and can be hash-compared
    * against a plain SQL replay.
    *
    * Scale shape: canonicalize + distinct (one shuffle), degree count (one
    * partial-aggregated shuffle), wedge join keyed on the wedge center,
    * closing join keyed on the (a,b) edge pair, and a map-side-combined
    * per-corner count. Nothing touches the driver; no windows; the output
    * is |V| rows (0-triangle nodes included, for clustering-coefficient
    * consumers).
    *
    * @param edges raw edge list — direction ignored, self-loops dropped,
    *              multi-edges counted once
    * @return (node, triangles) for every node with at least one edge
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).cast("long").as("a"),
                           col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    // canonical undirected simple edges: u < v, each pair once
    val und = raw.select(least(col("a"), col("b")).as("u"),
                         greatest(col("a"), col("b")).as("v")).distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // orient u→v along ≺ = (degree, id) lexicographic; carry the dst
    // endpoint's degree so the wedge join can compare ≺ without re-joining
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
    // wedges at the ≺-minimal corner: (src→dst1, src→dst2) with dst1 ≺ dst2
    val o1 = oriented.select(col("src").as("c"), col("dst").as("ta"),
                             col("ddst").as("da"))
    val o2 = oriented.select(col("src").as("c2"), col("dst").as("tb"),
                             col("ddst").as("db"))
    val wedges = o1.join(o2, col("c") === col("c2") &&
        (col("da") < col("db") ||
         (col("da") === col("db") && col("ta") < col("tb"))))
      .select(col("ta"), col("tb"), col("c"))
    // close the wedge: dst1 ≺ dst2 means the {dst1,dst2} edge, if present,
    // is oriented exactly dst1→dst2
    val closing = oriented.select(col("src").as("ta"), col("dst").as("tb"))
    val tris = wedges.join(closing, Seq("ta", "tb"))
    val corners = tris.select(explode(array(col("ta"), col("tb"), col("c")))
      .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("cnt"))
    deg.select(col("node"))
      .join(corners, Seq("node"), "left")
      .select(col("node"), coalesce(col("cnt"), lit(0L)).as("triangles"))
  }
}
