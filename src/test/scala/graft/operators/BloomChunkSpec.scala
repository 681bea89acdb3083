package graft.operators

import org.apache.spark.sql.functions._

/** Round-4 operators: bloom-prefiltered semi-join (exactness vs the plain
  * semi-join) and chunk-level exact dedup. */
class BloomChunkSpec extends graft.SparkSpec {

  test("bloomSemiJoin == plain semi-join (long keys, with misses and nulls)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val big = (1 to 2000).map(_ => (rnd.nextInt(500).toLong: java.lang.Long, rnd.nextInt()))
      .:+((null: java.lang.Long, 7)).toDF("k", "v")
    val keys = (1 to 120).map(_ => rnd.nextInt(700).toLong).toDF("key")
    val got = BloomJoin.bloomSemiJoin(big, keys, "k", "key")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val want = big.join(keys.select(col("key").as("k")).distinct(), Seq("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.sameElements(want) && got.nonEmpty)
  }

  test("bloomSemiJoin == plain semi-join (string keys); empty keys -> empty") {
    import spark.implicits._
    val big = Seq("a", "b", "c", "d", "a").toDF("k")
    val keys = Seq("a", "c", "zz").toDF("key")
    val got = BloomJoin.bloomSemiJoin(big, keys, "k", "key")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("a", "a", "c"))
    assert(BloomJoin.bloomSemiJoin(big, keys.limit(0), "k", "key").count() == 0)
  }

  test("qualityFilter: each rule fires on its pathological doc, clean doc kept") {
    import spark.implicits._
    val clean = "the quick brown fox jumps over a lazy dog and then " +
      "walks to the old mill for some fresh grain with friends nearby today"
    val docs = Seq(
      (1L, clean),                                       // keep
      (2L, "short text only here"),                      // too_short (+no_stopwords? no: 0 stopwords of 4 -> fires too)
      (3L, ("spam ham " * 30).trim),                     // repetitive + low_diversity + no_stopwords (+compressible: 269 B deflates to ~0.07)
      (4L, (1 to 25).map(i => s"w$i w$i").mkString(" ")) // repetitive pairs but diverse
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getString(1))).toMap
    assert(out(1L) == ((true, "")))
    assert(!out(2L)._1 && out(2L)._2.contains("too_short"))
    assert(!out(3L)._1 && out(3L)._2.contains("repetitive")
      && out(3L)._2.contains("low_diversity") && out(3L)._2.contains("no_stopwords"))
    // reasons are alphabetically ordered; the zlib gate joins the token
    // gates on this doc (269 bytes of one repeated bigram)
    assert(out(3L)._2 == "compressible,low_diversity,no_stopwords,repetitive")
  }

  test("qualityFilter Gopher structural gates: bullets, ellipses, symbols, " +
      "compression; line rules vacuous under 3 lines") {
    import spark.implicits._
    // genuinely varied lines: a templated body would itself trip the
    // compression / repetition gates and mask what this test pins
    val body = Seq(
      "the quick brown fox jumps over a lazy dog near the river",
      "a small market opened early and sold warm bread to everyone",
      "for the long winter they stored grain in the old cellar",
      "this narrow road winds past the orchard and into town",
      "it rained all night so the children stayed inside by the fire",
      "an old sailor told stories of distant ports and strange tides",
      "the museum displayed maps from voyages that charted unknown seas",
      "with patience the gardener coaxed roses from the rocky soil")
    val docs = Seq(
      (1L, body.mkString("\n")),                            // clean multi-line
      (2L, body.map("- " + _).mkString("\n")),              // bullet_lines
      (3L, body.map(_ + "...").mkString("\n")),             // ellipsis_lines (1 '...' per ~11-word line stays under the symbol gate)
      (4L, body.map(_ + " # # #").mkString("\n")),          // symbol_ratio (24 '#' / 96 tokens)
      (5L, "- the only line has a bullet and the rest of these twenty " +
        "words keep it from tripping the short gate ok"),   // 1 line: bullet rule vacuous
      (6L, ("the words repeat here now so " * 12).trim)     // compressible (216B? no: 360B) + repetitive
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getString(1))).toMap
    assert(out(1L)._1, s"clean multi-line doc dropped: ${out(1L)._2}")
    assert(out(2L)._2.split(",").contains("bullet_lines"))
    assert(out(3L)._2.split(",").contains("ellipsis_lines")
      && !out(3L)._2.contains("symbol_ratio"),
      s"one '...' per 11-word line must stay under the 0.1 symbol gate: ${out(3L)._2}")
    assert(out(4L)._2.split(",").contains("symbol_ratio")
      && !out(4L)._2.contains("bullet_lines"))
    assert(!out(5L)._2.contains("bullet_lines"),
      s"single-line doc must not trip line rules: ${out(5L)._2}")
    assert(out(6L)._2.split(",").contains("compressible"))
  }

  test("quantize/dequantize: codes in [0,127], reconstruction within half-step") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, -1.0f, 5.0f)),
      (2L, Array(1.0f, 1.0f, 5.0f)),   // dim 2 is degenerate (hi == lo)
      (3L, Array(0.5f, 0.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val (lo, hi) = VectorQuantize.trainMinMax(vecs, "embedding")
    assert(lo.toSeq == Seq(0.0, -1.0, 5.0) && hi.toSeq == Seq(1.0, 1.0, 5.0))
    val q = VectorQuantize.quantize(vecs, "embedding", lo, hi)
    val codes = q.select("vec_id", "qcode").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L) == Seq(0, 0, 0))
    assert(codes(2L) == Seq(127, 127, 0))
    assert(codes(3L) == Seq(64, 64, 0)) // 0.5*127+0.5 -> 64; (-0+1)*127/2+0.5 -> 64
    // reconstruction error bounded by half a quantization step per dim
    val deq = q.select(col("vec_id"),
        VectorQuantize.dequantize(col("qcode"), lo, hi).as("dq"), col("embedding"))
      .collect()
    deq.foreach { r =>
      val dq = r.getSeq[Double](1); val v = r.getSeq[Float](2)
      for (i <- dq.indices) {
        val step = (hi(i) - lo(i)) / 127.0
        assert(math.abs(dq(i) - v(i)) <= step / 2 + 1e-9,
          s"vec ${r.getLong(0)} dim $i: ${dq(i)} vs ${v(i)}")
      }
    }
  }

  test("sampleKPerGroup: exactly k per group, repartition-invariant") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val s1 = Sampling.sampleKPerGroup(df, "id", "g", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1.size == 21 && s1.groupBy(_._2).forall(_._2.size == 7))
    val s2 = Sampling.sampleKPerGroup(df.repartition(13), "id", "g", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 == s2, "sample must be partitioning-invariant")
    // k larger than the group keeps everything
    val tiny = Seq((1L, "a"), (2L, "a")).toDF("id", "g")
    assert(Sampling.sampleKPerGroup(tiny, "id", "g", 10).count() == 2)
  }

  test("chunkDups: duplicated boilerplate chunk found with first owner") {
    import spark.implicits._
    // chunkChars=10, overlap=0 -> fixed 10-char chunks
    val docs = Seq(
      (3L, "AAAAAAAAAABBBBBBBBBB"), // chunks: A*10 (c0), B*10 (c1)
      (1L, "CCCCCCCCCCAAAAAAAAAA"), // chunks: C*10 (c0), A*10 (c1)
      (2L, "DDDDDDDDDD")            // unique chunk
    ).toDF("doc_id", "text")
    val dups = Dedup.chunkDups(docs, "doc_id", "text",
      chunkChars = 10, overlap = 0, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // A*10 appears in doc 3 chunk 0 and doc 1 chunk 1 -> owner = doc 1
    assert(dups.toSeq == Seq((1L, 1L, 2L, "AAAAAAAAAA")))
  }
}
