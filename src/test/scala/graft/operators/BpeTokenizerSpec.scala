package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkSpec {

  test("learnMerges follows pair frequencies with lexicographic tie-break") {
    val s = spark; import s.implicits._
    // corpus: "low" x5, "lower" x2 -> pairs over {l,o,w,e,r}:
    //   (l,o)=7 wins first; then (lo,w)=7 wins; then word "low" is one
    //   symbol "low</w>"... careful: "low" ends with w</w> so its pairs are
    //   (l,o),(o,w</w>); "lower": (l,o),(o,w),(w,e),(e,r</w>)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val merges = BpeTokenizer.learnMerges(docs, "text", numMerges = 3)
    // (l,o): 5+2=7 beats (o,w</w>)=5, (o,w)=2, (w,e)=2, (e,r</w>)=2
    assert(merges.head === ("l", "o"))
    // after merge 1: "low" = [lo, w</w>]; "lower" = [lo, w, e, r</w>]
    // pairs: (lo,w</w>)=5, (lo,w)=2, (w,e)=2, (e,r</w>)=2 -> (lo,w</w>)
    assert(merges(1) === ("lo", "w</w>"))
  }

  test("encodeWord applies merges by rank and round-trips") {
    assert(BpeTokenizer.encodeWord("low", Map(("l", "o") -> 0, ("lo", "w</w>") -> 1))
      .toSeq === Seq("low</w>"))
    assert(BpeTokenizer.encodeWord("lower", Map(("l", "o") -> 0, ("lo", "w</w>") -> 1))
      .toSeq === Seq("lo", "w", "e", "r</w>"))
    assert(BpeTokenizer.encodeWord("x", Map.empty[(String, String), Int])
      .toSeq === Seq("x</w>"))
  }

  test("tokenize emits in-order tokens; frequent words compress to fewer pieces") {
    val s = spark; import s.implicits._
    val docs = ((1L to 20L).map(i => (i, "the cat sat")) :+ (21L, "xyzzy"))
      .toDF("doc_id", "text")
    val out = BpeTokenizer.tokenize(docs, "doc_id", "text", numMerges = 50)
    val byDoc = out.collect().groupBy(_.getLong(0))
    // with 50 merges over this tiny vocab, frequent words become single tokens
    assert(byDoc(1L).sortBy(_.getLong(1)).map(_.getString(2)).toSeq ===
      Seq("the</w>", "cat</w>", "sat</w>"))
    // the rare word still round-trips through its pieces
    val rare = byDoc(21L).sortBy(_.getLong(1)).map(_.getString(2))
    assert(rare.mkString("").replace("</w>", "") === "xyzzy")
  }

  test("vocabulary ids are deterministic; tokenizeToIds inverts through it") {
    val s = spark; import s.implicits._
    val docs = ((1L to 10L).map(i => (i, "abc abd")) :+ (11L, "xyz"))
      .toDF("doc_id", "text")
    val merges = BpeTokenizer.learnMerges(docs, "text", numMerges = 5)
    val vocab = BpeTokenizer.vocabulary(merges,
      Seq("a", "b", "c", "d", "x", "y", "z"))
    // base symbols (plain + </w>-marked) precede merged tokens in rank order
    assert(vocab("a") === 0 && vocab("a</w>") === 1)
    assert(merges.zipWithIndex.forall { case ((x, y), i) =>
      vocab(x + y) === 14 + i })
    val ids = BpeTokenizer.tokenizeToIds(docs, "doc_id", "text", numMerges = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(ids.forall(_._3 >= 0), "all symbols in-vocab here: no UNK expected")
    // invert ids back to tokens and check doc 11 round-trips
    val inv = vocab.map(_.swap)
    val d11 = ids.filter(_._1 == 11L).sortBy(_._2).map(t => inv(t._3))
    assert(d11.mkString("").replace("</w>", "") === "xyz")
  }

  test("round-trip violations are empty on the real corpus slice") {
    val docs = spark.read.parquet(testDataDir("0.001") + "/documents.parquet")
    val bad = BpeTokenizer.roundTripViolations(docs, "doc_id", "text",
      numMerges = 100)
    assert(bad.count() === 0L)
  }

  test("byte fallback: non-ASCII expands to UTF-8 byte tokens and inverts") {
    // ASCII unaffected
    assert(BpeTokenizer.initialSymbols("cat").toSeq === Seq("c", "a", "t"))
    // 2-byte (é = U+00E9 → C3 A9), mixed with ASCII
    assert(BpeTokenizer.initialSymbols("café").toSeq ===
      Seq("c", "a", "f", "<0xC3>", "<0xA9>"))
    // 3-byte CJK (中 = U+4E2D → E4 B8 AD)
    assert(BpeTokenizer.initialSymbols("中").toSeq ===
      Seq("<0xE4>", "<0xB8>", "<0xAD>"))
    // supplementary plane walks CODE POINTS: 😀 = U+1F600 → F0 9F 98 80,
    // never CESU-8 surrogate halves
    assert(BpeTokenizer.initialSymbols("😀").toSeq ===
      Seq("<0xF0>", "<0x9F>", "<0x98>", "<0x80>"))
    // decode inverts through encodeWord + reassembly for every width
    for (w <- Seq("café", "straße", "中文", "a😀b", "naïve")) {
      val toks = BpeTokenizer.encodeWord(w,
        BpeTokenizer.frozenMerges.zipWithIndex.toMap)
      val got = BpeTokenizer.decodeByteFallback(
        toks.mkString("").replace(BpeTokenizer.EndOfWord, ""))
      assert(got === w, s"round trip failed for $w: $got")
    }
    // a token string with no byte runs passes through untouched
    assert(BpeTokenizer.decodeByteFallback("plain") === "plain")
  }
}
