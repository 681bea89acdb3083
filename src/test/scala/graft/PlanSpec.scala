package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: these are the plan shapes that make the
  * engine scale (SURVEY.md §4); if one regresses, sf0.1 timings barely move
  * but a 100 TB run would fall over — so they are asserted, not eyeballed. */
class PlanSpec extends SparkSpec {

  private val dir = testDataDir("0.01")
  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.explainString(FormattedMode) + "\n" +
      df.queryExecution.executedPlan.toString
  }

  test("flagship: broadcast dims, map-side window limit, pruned pushed scan") {
    val p = plan("q_view_flagship")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "dimension joins must broadcast, not shuffle")
    assert(p.contains("WindowGroupLimit"),
      "rank<=1 must prune map-side before the shuffle")
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey)]"))
    // column pruning: the orders scan must read exactly the 3 needed columns
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_orderdate:timestamp_ntz>"))
  }

  test("aggregation: partial (map-side) aggregation before one shuffle") {
    val p = plan("q_agg_pricing_summary")
    assert(p.contains("partial_sum"), "map-side combine missing")
    val exchanges = "Exchange".r.findAllIn(p.linesIterator.mkString("\n")).size
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_returnflag:string,l_linestatus:string>"),
      "lineitem scan must prune to the 5 needed columns")
  }

  test("parquet aggregate pushdown: count/min/max answered from footer metadata") {
    // The 100 TB shape for whole-table stats: with the V2 parquet source,
    // COUNT/MIN/MAX compile to PushedAggregation and are answered from
    // row-group footers — a metadata read, not a data scan. (V1 is the
    // session default for everything else; flipped only inside this test.)
    import org.apache.spark.sql.functions._
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val agg = spark.read.parquet(s"$dir/orders.parquet")
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("lo"),
          max(col("o_orderkey")).as("hi"))
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"count must push to the parquet footer:\n$p")
      assert(p.contains("MIN(o_orderkey)") && p.contains("MAX(o_orderkey)"),
        "min/max must push to the parquet footer")
      val row = agg.collect().head
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      // footer-derived values must equal the full-scan truth
      val truth = spark.read.parquet(s"$dir/orders.parquet")
        .agg(count(lit(1)), min(col("o_orderkey")), max(col("o_orderkey")))
        .collect().head
      assert(row.toSeq === truth.toSeq)
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.unset("spark.sql.parquet.aggregatePushdown")
    }
  }

  test("latest-order window: single shuffle, WindowGroupLimit both sides") {
    val p = plan("q_w1_latest_order")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expect partial + final window group limits")
  }

  test("top-k per group: rank filter pushed down as WindowGroupLimit") {
    val p = plan("q_topk_per_group")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "rk<=3 must prune per-partition before AND after the shuffle")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>"),
      "orders scan must prune to the 3 needed columns")
  }

  test("grouping sets: one shuffle for all three sets, map-side partials") {
    val p = plan("q_agg_grouping_sets")
    assert(p.contains("Expand"), "grouping-set expansion missing")
    assert(p.contains("partial_sum"), "map-side combine missing")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "grouping sets must aggregate in ONE shuffle, not one per set")
  }

  test("vector centroid: partial aggregation of the exploded frame") {
    val p = plan("q_vec_centroid")
    assert(p.contains("partial_sum"),
      "map-side combine missing — the 64x exploded frame would shuffle raw")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("full outer: both sides aggregated BEFORE the join (dates-sized outer)") {
    val p = plan("q_join_full_outer")
    assert(p.contains("FullOuter"), "full outer join missing")
    assert("partial_count".r.findAllIn(p).size >= 2,
      "aggregate-then-join regressed to join-then-aggregate")
  }

  test("lead/lag and percent_rank: one key-window shuffle each") {
    for (q <- Seq("q_window_leadlag", "q_window_percent_rank")) {
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$q: a per-user window needs exactly one hash exchange")
    }
  }

  test("partition pruning: the equality predicate prunes to ONE partition dir") {
    val p = plan("q_partition_pruning")
    // the predicate must appear on the PartitionFilters line of the scan —
    // a post-scan data filter would read every partition directory
    val pfLine = p.linesIterator.find(_.contains("PartitionFilters:"))
    assert(pfLine.exists(_.contains("o_orderpriority")),
      s"priority not in PartitionFilters — scan reads every partition: $pfLine")
  }

  test("salted aggregation: two-phase — salt partial then key combine") {
    val p = plan("q_agg_salted")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      "expected exactly (keys,salt) then (keys) exchanges")
    assert(p.contains("partial_sum"), "map-side combine missing")
  }

  test("embedding pairs headline: IVF-cell equi-join, no quadratic scan") {
    val p = plan("q_dedup_embedding")
    // the round-14 contract fold adds ONE sanctioned scalar cross (two
    // ONE-ROW count frames); the candidate machinery itself must still
    // never go quadratic — no shuffled cartesian anywhere, and the only
    // nested-loop join is that 1×1 combination
    assert(!p.contains("CartesianProduct"),
      "headline near-dup must not run an all-pairs join — that dies at 100x corpus")
    // plan() concatenates formatted + executed renderings, so one
    // operator appears up to 3 times (tree, detail section, executed)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3,
      "only the 1x1 count combination may nested-loop")
    assert(p.contains("cell"),
      "candidates must come from the IVF cell equi-join")
    assert(p.contains("float_vec_dot"), "native expression missing from plan")
  }

  test("embedding pairs exact variant: broadcast nested loop, in-join threshold") {
    val p = plan("q_dedup_embedding_exact")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "one side must broadcast; a shuffled cartesian would be strictly worse")
    // the >=threshold cut must run inside the join (pairs never materialize)
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("float_vec_dot")),
      "similarity threshold must be evaluated in the join condition")
  }

  test("simhash: capped group-collect candidates, hamming filter before distinct") {
    val p = plan("q_dedup_simhash")
    // the round-14 contract fold adds ONE sanctioned 1×1 count cross;
    // the candidate machinery itself must still never go quadratic
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3,
      "only the 1x1 count combination may nested-loop")
    assert(p.contains("collect_list"),
      "candidates must come from the capped bucket group-collect")
    // the verify cut must appear as a Filter on hamming, upstream of the
    // final pair HashAggregate(distinct) — i.e. bit_count runs pre-exchange
    assert(p.contains("bit_count"), "popcount verify missing from plan")
  }

  test("ngram jaccard: prefix-filtered equi-join on hashed shingles, native verify") {
    val p = plan("q_dedup_ngram")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "exact set-similarity join must never go quadratic")
    // the shingle+xxhash64 subtree runs once behind the eager checkpoint
    // boundary; the visible plan joins its (long) hash keys and verifies
    // with the native sorted-merge expression
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      "shingle frame must be materialized once (checkpoint boundary)")
    assert(p.contains("sorted_long_intersect_size"),
      "verification must use the native sorted-merge expression")
  }

  test("lsh top-k: candidates from band/bucket equi-join only") {
    val p = plan("q_sim_topk_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("band") && p.contains("bucket"))
  }

  test("text stats: ONE fused text_profile scan, no regex expressions") {
    val p = plan("q_text_stats")
    assert(p.contains("text_profile"), "fused profile expression missing")
    assert(!p.contains("RegExpExtract") && !p.contains("RegExpReplace")
      && !p.contains("regexp_count"), "regex passes must be gone from the hot path")
  }

  test("token budget: no single-partition global window") {
    val p = plan("q_token_budget")
    // an empty-partition-spec Window would log "No Partition Defined" and
    // run one task; the distributed form must window by bucket only
    assert(!p.contains("Window [") ||
      !p.linesIterator.exists(l => l.contains("Window") && l.contains("partitionBy: []")),
      "global window leaked into the plan")
    assert(p.contains("__bucket") || p.contains("CASE"),
      "bucketed prefix-sum structure missing")
  }

  test("narrow queries: no hash exchange, only the final sort's range exchange") {
    // these operators are pure per-row projections/filters — any hash
    // shuffle appearing here is a regression that turns a scan-bound 100 TB
    // pass into a shuffle-bound one
    for (q <- Seq("q_sample_stratified", "q_pii_redact", "q_text_stats",
        "q_text_fingerprint", "q_text_langid", "q_winnow_fp",
        "q_zorder_value")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q: hash shuffle in a shuffle-free operator")
    }
  }

  test("winnow overlap: fingerprint subplan shuffled once and reused at scale") {
    // sizes + both self-join sides read the same pruned-fingerprint
    // subplan. The shared-shuffle claim is asserted under the STATIC
    // planner with broadcast off (the at-scale join shape): ReuseExchange
    // proves the three subplans are canonically identical and collapse to
    // ONE fp_hash shuffle. (Under AQE the identical stages can materialize
    // concurrently before the stage cache registers a hit, and at tiny SF
    // AQE broadcasts the self-join side instead — both mask the property
    // this guard protects.)
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(k => spark.conf.set(k, if (k.endsWith("enabled")) "false" else "-1"))
    try {
      val df = SparkEntry.queries("q_winnow_overlap")(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"pruned-fingerprint exchange must be reused across consumers:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "pair generation must stay an equi-join on fp_hash")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("bloom semi-join: map-side bloom filter precedes the verifying semi") {
    val p = plan("q_join_bloom")
    assert(p.contains("LeftSemi"), "verifying semi-join missing")
    // the bloom probe must sit in a Filter on the fact side, BEFORE the
    // join — that filter is the entire point (candidate-only shuffle)
    assert(p.linesIterator.exists(l => l.contains("Filter") && l.contains("UDF")),
      "bloom prefilter not applied before the join")
  }

  test("heavy hitters: pruned scan, ObjectHashAggregate partial/final pair") {
    val p = plan("q_heavy_hitters")
    // the imperative MG aggregate must run as ObjectHashAggregate with a
    // map-side partial — only capacity-sized summaries cross the exchange
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "MG summary must partial-aggregate map-side before the exchange")
    assert(p.contains("ReadSchema: struct<user_id:bigint>"),
      "events scan must prune to the single item column")
  }

  test("pagerank: partial-aggregated contribution sums, no bare-key shuffle of edges per rank read") {
    val p = plan("q_pagerank")
    // each iteration's dst-keyed contribution sum must map-side combine
    assert(p.contains("partial_sum"),
      "contribution sums must partial-aggregate before their exchange")
    // the rank⋈edges joins must be hash joins (broadcast or shuffled),
    // never nested-loop — integer mass makes any join order exact
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("triangles: hash joins end to end, map-side-combined corner count") {
    val p = plan("q_triangles")
    // wedge + closure must be hash joins on their keys — a nested-loop
    // here is the quadratic all-pairs plan the orientation exists to avoid
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the per-corner count must partial-aggregate before its exchange
    assert(p.contains("partial_count"),
      "corner count must map-side combine")
    // the graph family shares one checkpointed co-purchase edge frame —
    // consumers must read the materialized frame, not rebuild the
    // lineitem self-join per query
    assert(p.contains("Scan ExistingRDD"),
      "q_triangles must consume the shared checkpointed edge frame")
    // …and the pruning guard moves to the frame BUILDER's plan: the one
    // lineitem scan that feeds the whole family reads exactly the two
    // co-purchase columns
    val builder = registry.GraphRegistry.coPurchaseEdgesPlan(spark, dir)
    val bp = builder.queryExecution.explainString(FormattedMode)
    assert(bp.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>"),
      "edge-frame lineitem scan must prune to orderkey+partkey")
  }

  test("label propagation: per-round argmax is an aggregation, never a window sort") {
    val p = plan("q_label_prop")
    // neighbor-label counts must map-side combine before their exchange
    assert(p.contains("partial_count"),
      "(node, label) counts must partial-aggregate")
    // the per-node argmax must be max(struct(cnt, -lab)) — partial-
    // aggregable — not a row_number window (which would shuffle AND sort
    // every (node, label) row per round)
    assert(p.contains("partial_max(struct(cnt"),
      "argmax must run as a partial-aggregated max(struct)")
    assert(!p.contains("Window "), "no window operator expected in LPA rounds")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("khop BFS loop body: frontier join + node-keyed partial min") {
    // q_khop materializes per hop at build time, so audit ONE loop body
    // directly: the relax round must partial-aggregate its min and join
    // frontier⋈edges as a hash join
    val e = spark.range(0, 1000).selectExpr("id AS src", "(id * 7) % 1000 AS dst")
    val frontier = spark.range(0, 10).selectExpr("id AS node", "0 AS dist")
    val next = frontier.join(e, frontier("node") === e("src"))
      .select(e("dst").as("node"), org.apache.spark.sql.functions.lit(1).as("dist"))
    val relaxed = frontier.unionByName(next).groupBy("node")
      .agg(org.apache.spark.sql.functions.min("dist").as("dist"))
    val p = relaxed.queryExecution.executedPlan.toString
    assert(p.contains("partial_min"), "relax min must map-side combine")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("containment: prefix-probe equi-join on hashed shingles, native verify") {
    val p = plan("q_dedup_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "containment candidates must come from the prefix-posting equi-join")
    // per-pair verify runs the sorted-long merge intersect, not array_intersect
    assert(p.contains("sorted_long_intersect_size"),
      "verify must use the native merge-intersect expression")
    // the probe side slices the df-ordered prefix before exploding
    assert(p.contains("slice("), "prefix slice missing — full postings on the probe side")
  }

  test("warc parse and crawl front stay map-side") {
    // one task per archive, streaming record iterator; the ONLY exchange
    // either query pays is its output sort
    for (q <- Seq("q_warc_records", "q_warc_extract")) {
      val p = plan(q)
      assert(!p.contains("HashAggregate") && !p.contains("Join") &&
        !p.contains("Window"), s"$q: archive parse must stay narrow")
    }
  }

  test("unigram tokenize: narrow Viterbi, only the output sort exchanges") {
    val p = plan("q_unigram_tokenize")
    assert(!p.contains("Join") && !p.contains("HashAggregate") &&
      !p.contains("Window"), "tokenization must be per-row")
    // LM rollup: the 1M-row token stream combines map-side before the
    // doc-keyed shuffle — whole token text never crosses the wire
    val ppl = plan("q_unigram_ppl")
    assert(ppl.contains("partial_sum"), "LM cost must partial-aggregate")
  }

  test("robots gate: broadcast decision table, zero URL-side shuffle") {
    val p = plan("q_robots_gate")
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "the decision table must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no sort-merge join anywhere: rules-side joins are broadcast too")
    // the DOCUMENT-URL stream must feed the broadcast join with no
    // exchange/window/agg of its own: since round 14 the URL side is a
    // Union of the doc stream (scan → projections) with the 20-row
    // pathless-root fixture branch (a distinct, domain-count-sized), so
    // the motif asserts the union's FIRST branch is the bare scan chain
    // (the parser's windows still live on the tiny rules side)
    val motif = ("""(?s)BroadcastHashJoin LeftOuter BuildRight \(\d+\)\s*\n""" +
      """\s*:- Union \(\d+\)\s*\n""" +
      """\s*:  :- Project \(\d+\)\s*\n\s*:  :  \+- Project \(\d+\)\s*\n""" +
      """\s*:  :     \+- Scan parquet""").r
    assert(motif.findFirstIn(p).isDefined,
      s"URL side must be scan→project straight into the broadcast join:\n$p")
  }

  test("mmr: one query-keyed shuffle feeds both the top-N window and the greedy collect") {
    val p = plan("q_sim_mmr")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "top-N must prune map-side before the query shuffle")
    assert(p.contains("ObjectHashAggregate"),
      "the candidate collect must aggregate, not re-shuffle")
    // exactly two SHUFFLE exchanges in the executed plan: the query-keyed
    // window shuffle (whose partitioning the collect reuses) and the
    // final sort — BroadcastExchange (the bounded query set) excluded
    val exec = SparkEntry.queries("q_sim_mmr")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange (hash|range)partitioning".r.findAllIn(exec).size == 2,
      s"MMR must pay exactly window + sort exchanges:\n$exec")
  }

  test("global audit: no cartesian products or unexpected nested-loop joins anywhere") {
    // Lazily-planned queries audited here at build time; the EAGER
    // remainder (PlanAudit.eager) is audited by PlanAuditSpec, which
    // executes them under a SQL-execution listener — between the two
    // specs every harness query is covered.
    for ((name, _) <- SparkEntry.queries if !PlanAudit.eager.contains(name)) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: shuffled cartesian")
      if (!PlanAudit.bnljAllowed.contains(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name: unexpected nested-loop join")
    }
  }

  test("corpus pipeline final stage: exactly the two needed partitionings") {
    // FINDING (round-4 advice #6): the pipeline's stages CANNOT share a
    // shuffle — quality filtering is narrow (one fused profile scan, no
    // exchange at all), exact dedup partitions by key5, pair derivation by
    // shingle hash, connected components by node id, budget selection by
    // prefix-sum range bucket: no two adjacent stages use the same
    // partitioning, so there is no ReuseExchange to claim. The one
    // same-key adjacency (CC labels ↔ survivor join, both doc_id-keyed)
    // is split by the eager checkpoint that keeps AQE alive inside the
    // iterative loop (the measured-3x persist lesson) — re-joining their
    // lineage to enable exchange reuse would cost more than the one
    // narrow-row shuffle it saves. What IS guarded: the post-checkpoint
    // final stage carries exactly the two partitionings the algorithm
    // needs (hash on the token-budget bucket, range for the output order)
    // and nothing redundant.
    val df = SparkEntry.queries("q_corpus_pipeline")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 2, s"unexpected exchange count:\n$p")
    assert(p.contains("Exchange hashpartitioning(__bucket"), p)
    assert(p.contains("Exchange rangepartitioning(doc_id"), p)
  }

  test("corpus pipeline v2 final stage: same two partitionings, no extras") {
    // The v2 ladder adds three stages (substring removal, re-filter,
    // semantic CC) upstream of the checkpoint, but the post-checkpoint
    // final stage must stay the SAME minimal shape as v1: one hash
    // exchange on the prefix-sum bucket, one range exchange for the
    // output order — the extra stages buy their shuffles inside their own
    // checkpointed segments (gram-keyed, doc-keyed, pair-keyed), none of
    // them leaks a redundant exchange into the budget stage.
    val df = SparkEntry.queries("q_corpus_pipeline_v2")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 2, s"unexpected exchange count:\n$p")
    assert(p.contains("Exchange hashpartitioning(__bucket"), p)
    assert(p.contains("Exchange rangepartitioning(doc_id"), p)
  }

  test("keep-best dedup: partial max_by pair, no window, one survivor per key shuffled") {
    val p = plan("q_dedup_keepbest")
    // the point of the agg path vs W1: partial aggregation before the
    // exchange — each map task ships ONE best-so-far row per key, never
    // every duplicate — and no window/rank machinery anywhere
    assert(p.contains("partial_max_by"), s"no partial aggregation:\n$p")
    assert(!p.contains("Window"), s"window leaked into the agg path:\n$p")
    val aggs = "SortAggregate|ObjectHashAggregate|HashAggregate".r
      .findAllIn(p).size
    assert(aggs >= 2, s"expected a partial/final aggregate pair:\n$p")
  }

  test("join revenue: dims broadcast, fact tables shuffle-joined") {
    val p = plan("q_join_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "customer+nation must broadcast")
  }
}
