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
}
