package graft

import org.scalatest.funsuite.AnyFunSuite

/** The harness-surface contract (README "Correctness contract"): every
  * query the driver runs is gated. Concretely:
  *
  *   1. every `oracleSql` key names a real query (no dangling oracles
  *      silently skipped by the driver);
  *   2. every query either carries a DuckDB oracle, or is an
  *      approximate-by-design headline that ships BOTH an exact oracled
  *      sibling/recall spec AND an empty-relation `*_verify` property
  *      oracle — so no new no-oracle query can land unnoticed;
  *   3. the no-oracle set is pinned exactly: growing it is a conscious,
  *      reviewed act (update the list here AND ship the `_verify`
  *      sibling), never a side effect.
  */
class OracleContractSpec extends AnyFunSuite {

  // the no-oracle headliners: approximate-by-design (engine-specific
  // signatures, sketch internals, or partitioning-order-dependent
  // estimates), plus corpus-LEARNED BPE whose merge-learning loop is
  // EXACT but iterative (not ANSI-expressible — the frozen-merge
  // q_bpe_tokenize, by contrast, IS oracled via the recursive-CTE
  // replay); each exact/recall/round-trip-gated elsewhere and each
  // driver-gated by its *_verify property sibling
  private val approximateByDesign = Set(
    "q_approx_distinct", "q_dedup_embedding", "q_dedup_minhash",
    "q_dedup_simhash", "q_dedup_semantic", "q_sim_topk_ivf", "q_sim_topk_pq",
    "q_bpe_learned", "q_quantile_approx", "q_heavy_hitters",
    "q_stream_hotkeys", "q_hll_rollup", "q_hll_native", "q_stream_hll",
    "q_cms_native", "q_stream_cms", "q_triangles_approx",
    "q_quantile_native", "q_stream_quantile",
    // KMV overlap estimates: exact sibling q_kmv_overlap_exact carries the
    // oracle; q_kmv_overlap_verify bounds every figure + byte-exact merge;
    // q_stream_kmv_verify pins stream ≡ batch bit-exact
    "q_kmv_overlap", "q_stream_kmv",
    // CMS join-size estimate: exact sibling q_join_size_exact carries the
    // oracle; q_join_size_verify gates the no-undercount + bound contract
    "q_join_size_est",
    // k-core: exact + deterministic but iterative (not ANSI-expressible,
    // like BPE); the _verify certificate gate re-proves the decomposition
    // with pure joins, and GraphSpec pins it to brute-force peeling
    "q_kcore",
    // streamed Bloom bits: engine-specific XXH64 double hashing (like the
    // sketch internals above); q_stream_bloom_verify pins stream ≡ batch
    // byte-exact + the no-false-negative contract, and BloomIndexSpec
    // re-proves both on a controlled multi-batch replay
    "q_stream_bloom",
    // per-group MG estimates: engine-internal decrement schedule (same as
    // q_heavy_hitters); exact sibling q_hotkeys_by_group_exact carries the
    // oracle, q_hotkeys_by_group_verify re-proves every per-group bound
    "q_hotkeys_by_group",
    // KMV sketch sibling of the source overlap matrix: estimates are
    // sketch-internal (like q_kmv_overlap); exact sibling
    // q_source_overlap carries the oracle, the _verify bounds every
    // figure against the exact fingerprint sets in-engine
    "q_source_overlap_est",
    // IVF→PQ two-stage retrieval: emitted cosines are EXACT (short-list
    // re-rank reads raw vectors) but WHICH neighbors the probes reach is
    // engine-internal (k-means cells + codebooks, same as q_sim_topk_ivf
    // / q_sim_topk_pq); exact sibling q_sim_topk carries the oracle and
    // the _verify gates score equality, rank shape, AND a recall floor
    "q_sim_topk_ivfpq",
    // streamed ANN serving: same engine-internal probe reach as
    // q_sim_topk_ivfpq (exact sibling q_sim_topk); the _verify pins the
    // bounded stream ≡ batch topKIndexed EXACTLY under shared models
    "q_stream_ann",
    // streamed fuzzy curation: MinHash banding is engine-internal (like
    // q_dedup_minhash, whose verified family is the exact relative); the
    // _verify pins stream ≡ batch statuses verbatim, uncapped both sides
    "q_stream_curate_fuzzy")

  test("every oracleSql key names an implemented query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query is driver-gated: an oracle, or _verify + exact sibling") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === approximateByDesign,
      "the no-oracle set changed — a new approximate query MUST ship an " +
        "exact oracled sibling (or recall spec) AND an empty-relation " +
        "*_verify property oracle, then be added to approximateByDesign " +
        s"here. Unexpected: ${noOracle -- approximateByDesign}; " +
        s"missing: ${approximateByDesign -- noOracle}")
    approximateByDesign.foreach { q =>
      assert(SparkEntry.queries.contains(s"${q}_verify"),
        s"$q lacks its ${q}_verify property sibling in queries")
      assert(SparkEntry.oracleSql.contains(s"${q}_verify"),
        s"${q}_verify lacks its empty-relation oracle")
    }
  }

  test("no oracle surfaces a HUGEINT result column (driver-hash type drift)") {
    // DuckDB widens integer SUMs (plain, windowed, via CTE) to HUGEINT;
    // Spark has no INT128, and the driver canonicalizes HUGEINT differently
    // from BIGINT — so a value-identical result still hash-mismatches
    // (round-8: q_rate_anomalies / q_stream_anomalies / q_text_entropy).
    // Shell out to tools/lint_oracle_types.py, which DESCRIBEs every oracle
    // in DuckDB (no data scanned) and fails on HUGEINT/UHUGEINT columns.
    import scala.sys.process._
    val sfDir = new java.io.File("/root/testdata/sf0.001")
    assume(sfDir.isDirectory, "testdata unavailable — lint not runnable here")
    val quiet = ProcessLogger(_ => ())
    val duckOk = scala.util.Try(
      Seq("python3", "-c", "import duckdb").!(quiet) == 0).getOrElse(false)
    assume(duckOk, "python3+duckdb unavailable — lint not runnable here")
    val json = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(json, Verify.oracleJson)
    val out = new StringBuilder
    val code = Seq("python3", "tools/lint_oracle_types.py",
        sfDir.getPath, json.toString)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    java.nio.file.Files.deleteIfExists(json)
    assert(code == 0, s"oracle type lint failed:\n$out")
  }

  test("every *_verify property oracle is an empty relation") {
    val verifies = SparkEntry.oracleSql.filter(_._1.endsWith("_verify"))
    assert(verifies.nonEmpty)
    verifies.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("WHERE FALSE"),
        s"$name: a *_verify oracle must be the empty relation (violations-only contract)")
    }
  }
}
