package graft.operators

import org.apache.spark.sql.functions._

/** Specs for decontamination, sequence packing, and the repetition filter. */
class PackDecontSpec extends graft.SparkSpec {

  test("decontaminate: shared n-grams counted, clean docs absent") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different sentence with no overlap at all"),
      (3L, "quick brown fox jumps over nothing today friends"),
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "the quick brown fox jumps straight up"),
    ).toDF("doc_id", "text")
    val out = Decontaminate.contaminationReport(corpus, eval, "doc_id", "text", n = 5)
      .orderBy("doc_id").as[(Long, Long)].collect()
    // eval 5-grams: "the quick brown fox jumps", "quick brown fox jumps straight",
    // "brown fox jumps straight up". Doc 1 shares the first; doc 3 shares none
    // (its grams start at "quick brown fox jumps over"); doc 2 shares none.
    assert(out.toSeq == Seq((1L, 1L)))
  }

  test("decontaminate: bloom prefilter output identical to exact path") {
    import spark.implicits._
    val corpus = (1L to 60L).map(i =>
      (i, s"common prefix tokens here ${i % 7} unique tail $i ${i * 31 % 13} pad pad"))
      .toDF("doc_id", "text")
    val eval = (1L to 5L).map(i =>
      (1000 + i, s"common prefix tokens here ${i} unique tail $i ${i * 31 % 13} pad pad"))
      .toDF("doc_id", "text")
    val exact = Decontaminate.contaminationReport(corpus, eval, "doc_id", "text",
      n = 4, bloomPrefilter = false).orderBy("doc_id").collect().toSeq
    val bloomed = Decontaminate.contaminationReport(corpus, eval, "doc_id", "text",
      n = 4, bloomPrefilter = true).orderBy("doc_id").collect().toSeq
    assert(exact == bloomed)
    assert(exact.nonEmpty)
  }

  test("decontaminate plan: broadcast probe, no shuffle join on shingles") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val eval = Seq((2L, "b c d e f g")).toDF("doc_id", "text")
    val plan = Decontaminate.contaminationReport(corpus, eval, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"shuffle join on shingles in:\n$plan")
  }

  test("packing: boundary-exact docs don't split, straddlers do, empty docs keep seq") {
    import spark.implicits._
    // capacity 10; cum starts: a=0, b=4, c=10, d=10, e=18
    val docs = Seq(
      (1L, 4L),  // [0,4)   seq 0
      (2L, 6L),  // [4,10)  seq 0, ends exactly at boundary - no split
      (3L, 0L),  // empty at 10 — seq 1, never split
      (4L, 8L),  // [10,18) seq 1
      (5L, 5L),  // [18,23) seq 1, straddles into seq 2 - split
    ).toDF("doc_id", "n_tok")
    val out = Packing.packSequences(docs, "doc_id", "n_tok", capacity = 10L)
      .orderBy("doc_id")
      .select("doc_id", "seq_id", "is_split").as[(Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 0L, false), (2L, 0L, false), (3L, 1L, false),
      (4L, 1L, false), (5L, 1L, true)))
  }

  test("packInterleaved: image budget, item offsets, doc split flags") {
    import spark.implicits._
    val items = Seq(
      // doc 1: text(3 tok) image text(2 tok) — 3 + 8 + 2 = 13 tokens
      (1L, 0L, "text", "one two three"),
      (1L, 1L, "image", null: String),
      (1L, 2L, "text", "four five"),
      // doc 2: image only — 8 tokens, starts at 13, crosses cap 16
      (2L, 0L, "image", null: String),
      // doc 3: empty text item — 0 tokens, never splits
      (3L, 0L, "text", "   "))
      .toDF("doc_id", "pos", "kind", "text")
    val out = Packing.packInterleaved(items, "doc_id", "pos", "kind",
        "text", imageBudget = 8L, capacity = 16L)
      .orderBy("doc_id", "pos")
      .select("doc_id", "n_items", "n_tokens", "seq_id", "is_split",
        "pos", "kind", "n_tok", "g_start", "g_end")
      .as[(Long, Long, Long, Long, Boolean, Long, String, Long, Long, Long)]
      .collect()
    assert(out.toSeq === Seq(
      (1L, 3L, 13L, 0L, false, 0L, "text", 3L, 0L, 3L),
      (1L, 3L, 13L, 0L, false, 1L, "image", 8L, 3L, 11L),
      (1L, 3L, 13L, 0L, false, 2L, "text", 2L, 11L, 13L),
      (2L, 1L, 8L, 0L, true, 0L, "image", 8L, 13L, 21L),
      (3L, 1L, 0L, 1L, false, 0L, "text", 0L, 21L, 21L)))
  }

  test("packInterleavedCosted: caller cost column, NULL cost reads as 0") {
    import spark.implicits._
    val items = Seq(
      (1L, 0L, "text", Some(5L)),
      (1L, 1L, "image", Some(8L)),
      // a join-derived NULL cost must not poison the later offsets
      (1L, 2L, "text", None: Option[Long]),
      (1L, 3L, "text", Some(3L)))
      .toDF("doc_id", "pos", "kind", "cost")
    val out = Packing.packInterleavedCosted(items, "doc_id", "pos",
        "kind", "cost", capacity = 100L)
      .orderBy("pos")
      .select("pos", "n_tok", "g_start", "g_end", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(
      (0L, 5L, 0L, 5L, 16L),
      (1L, 8L, 5L, 13L, 16L),
      (2L, 0L, 13L, 13L, 16L), // null → zero-width item, offsets exact
      (3L, 3L, 13L, 16L, 16L)))
  }

  test("ffdPack: first-fit-decreasing order, oversize singletons, FFD half-full property") {
    import spark.implicits._
    // one shard (shards = 1) so the fold order is fully predictable:
    // sorted desc = 300(oversize), 9, 7, 6, 5, 3 at capacity 10
    val docs = Seq((1L, 9L), (2L, 7L), (3L, 6L), (4L, 5L), (5L, 3L),
      (6L, 300L)).toDF("doc_id", "n_tok")
    val out = Packing.ffdPack(docs, "doc_id", "n_tok", capacity = 10L,
        shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "bin", "fill_after", "oversize")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // fold: 300 -> new bin0 (oversize); 9 -> bin1; 7 -> bin2; 6 -> bin3;
    // 5 -> bin4 (7+5, 6+5 > 10); 3 -> bin2 (first fit: 7+3 = 10)
    assert(out === Seq(
      (1L, 1L, 9L, false), (2L, 2L, 7L, false), (3L, 3L, 6L, false),
      (4L, 4L, 5L, false), (5L, 2L, 10L, false), (6L, 0L, 300L, true)))

    // FFD property on real-ish data: per shard, at most ONE non-oversize
    // bin ends under half full, and no bin ever crosses capacity
    val rand = (1L to 400L).map(i => (i, 1L + (i * 37) % 200))
      .toDF("doc_id", "n_tok")
    val packed = Packing.ffdPack(rand, "doc_id", "n_tok", capacity = 256L,
      shards = 4)
    val fills = packed.filter(!$"oversize")
      .groupBy($"shard", $"bin").agg(max($"fill_after").as("fill"))
    assert(fills.filter($"fill" > 256L).count() === 0L)
    val halfEmpty = fills.filter($"fill" * 2 < 256L)
      .groupBy($"shard").count().filter($"count" > 1L).count()
    assert(halfEmpty === 0L, "two under-half bins in one shard breaks first-fit")
  }

  test("length-bucketed batches: dense chops, waste vs own batch max, length-monotone buckets") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, 10L + i * 3)).toDF("doc_id", "n_tok")
    val out = Packing.lengthBucketedBatches(docs, "doc_id", "n_tok",
      numBuckets = 4, batchDocs = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length === 100)
    // buckets are length-monotone: every doc in bucket b is <= every doc in b+1
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    for (b <- byBucket.keys if byBucket.contains(b + 1))
      assert(byBucket(b).max <= byBucket(b + 1).min, s"bucket $b overlaps ${b + 1}")
    // batches chop densely at 8 docs; each batch's waste is vs ITS max
    for (((_, batch), rows) <- out.groupBy(t => (t._3, t._4))) {
      assert(rows.length <= 8)
      val mx = rows.map(_._2).max
      assert(rows.forall(t => t._5 == mx && t._6 == mx - t._2))
    }
    // padding efficiency: bucketed waste strictly beats one global batch max
    val globalWaste = out.map(t => out.map(_._2).max - t._2).sum
    assert(out.map(_._6).sum < globalWaste / 4,
      "length bucketing must cut padding waste by a wide margin on a length ramp")
  }

  test("packing stats: docs and tokens attributed to first-token sequence") {
    import spark.implicits._
    val docs = Seq((1L, 4L), (2L, 6L), (3L, 8L), (4L, 5L)).toDF("doc_id", "n_tok")
    val stats = Packing.packingStats(docs, "doc_id", "n_tok", capacity = 10L)
      .orderBy("seq_id").as[(Long, Long, Long, Long)].collect()
    // seq 0: docs 1,2 (10 tokens, none split); seq 1: docs 3,4 (13 tokens, doc 4 splits)
    assert(stats.toSeq == Seq((0L, 2L, 10L, 0L), (1L, 2L, 13L, 1L)))
  }

  test("repetition: repeated bigram dominates, distinct text scores low, short docs 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam ham spam ham spam ham"),        // "spam ham" x3 of 5 bigrams, 6 toks
      (2L, "all words here are fully distinct"), // every bigram unique: 2/6
      (3L, "solo"),                              // < 2 tokens - no bigram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topBigramFraction(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 2.0 * 3 / 6) < 1e-12)
    assert(math.abs(out(2L) - 2.0 * 1 / 6) < 1e-12)
    assert(out(3L) == 0.0)
  }
}
