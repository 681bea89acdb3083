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

  test("round-trip violations are empty on the real corpus slice") {
    val docs = spark.read.parquet(testDataDir("0.001") + "/documents.parquet")
    val bad = BpeTokenizer.roundTripViolations(docs, "doc_id", "text",
      numMerges = 100)
    assert(bad.count() === 0L)
  }
}
