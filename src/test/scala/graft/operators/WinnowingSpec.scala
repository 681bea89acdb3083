package graft.operators

import org.apache.spark.sql.functions._

/** Winnowed fingerprinting: golden selection rule, the SIGMOD'03 coverage
  * guarantee, brute-force equivalence, and passage-overlap detection. */
class WinnowingSpec extends graft.SparkSpec {

  /** Straight-from-the-paper reference: every window's rightmost minimum,
    * collected as a distinct set. */
  private def bruteWinnow(tokens: Array[String], k: Int, w: Int): Set[(Int, Long)] = {
    val m = tokens.length - k + 1
    if (m <= 0) return Set.empty
    val h = Array.tabulate(m)(i =>
      Winnowing.polyHash32(tokens.slice(i, i + k).mkString(" ")))
    val we = math.min(w, m)
    (0 to m - we).map { s =>
      val best = (s until s + we).foldLeft(s)((b, j) => if (h(j) <= h(b)) j else b)
      (best, h(best))
    }.toSet
  }

  test("polyHash32 equals the Java 31-fold (and the SQL twin's value)") {
    assert(Winnowing.polyHash32("abc") == 96354L) // == "abc".hashCode
    assert(Winnowing.polyHash32("") == 0L)
    // stays in [0, 2^32) where String.hashCode would wrap negative
    val big = Winnowing.polyHash32("key agg row scan slow fast table")
    assert(big >= 0L && big < 4294967296L)
  }

  test("polyHash32 folds by CODE POINT: astral text matches the SQL twin") {
    // the ANSI oracle computes list_transform(split(g,''), c -> unicode(c))
    // folded with (a*31 + c) % 2^32 — i.e. a code-point fold. Values below
    // verified against DuckDB 1.x directly (split('') yields code points,
    // unicode() the scalar value). A UTF-16 charAt fold would diverge on
    // every supplementary-plane character (it sees two surrogates).
    def cpFold(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 4294967296L)
    val astral = Seq(
      "café 😀 🚀rocket", // café 😀 🚀rocket
      "𝄞 music 🧠",           // 𝄞 music 🧠
      "plain ascii stays identical")
    astral.foreach { s =>
      assert(Winnowing.polyHash32(s) == cpFold(s), s)
      assert(Winnowing.polyHash32(s) >= 0L && Winnowing.polyHash32(s) < 4294967296L)
    }
    // cross-checked constants from DuckDB (see scaladoc): these pin the
    // cross-engine contract even without a duckdb process in this JVM
    assert(Winnowing.polyHash32("café 😀 🚀rocket") == 3095074805L)
    assert(Winnowing.polyHash32("𝄞 music 🧠") == 4261504419L)
    // and the full winnow pipeline runs astral text without divergence
    // between the UDF path and the JVM reference
    import spark.implicits._
    val df = Seq((1L, "😀 a b c d e f 🧠 g h 𝄞 i j"))
      .toDF("doc_id", "text")
    val viaDf = Winnowing.fingerprints(df, "doc_id", "text", k = 4, w = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val direct = Winnowing.winnow(
      "😀 a b c d e f 🧠 g h 𝄞 i j"
        .split("\\s+"), 4, 4).toSet
    assert(viaDf == direct)
  }

  test("winnow matches brute-force reference on random token streams") {
    val vocab = Array("a", "b", "c", "d", "key", "agg", "row", "scan", "slow")
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(40)
      val toks = Array.fill(n)(vocab(rnd.nextInt(vocab.length)))
      val got = Winnowing.winnow(toks, k = 4, w = 4).toSet
      assert(got == bruteWinnow(toks, 4, 4), s"tokens=${toks.mkString(" ")}")
    }
  }

  test("selected positions are non-decreasing (DISTINCT == dedupe-vs-last)") {
    val rnd = new scala.util.Random(11)
    val vocab = Array("x", "y", "z", "w", "v")
    for (_ <- 1 to 100) {
      val toks = Array.fill(5 + rnd.nextInt(50))(vocab(rnd.nextInt(vocab.length)))
      val pos = Winnowing.winnow(toks, 4, 4).map(_._1)
      assert(pos.sameElements(pos.sorted), toks.mkString(" "))
    }
  }

  test("coverage guarantee: shared run of k+w-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(13)
    val vocab = Array("p", "q", "r", "s", "t", "u")
    for (trial <- 1 to 50) {
      val passage = Array.fill(7)(vocab(rnd.nextInt(vocab.length))) // k+w-1 = 7
      def doc() = Array.fill(10)(vocab(rnd.nextInt(vocab.length))) ++
        passage ++ Array.fill(10)(vocab(rnd.nextInt(vocab.length)))
      val fpA = Winnowing.winnow(doc(), 4, 4).map(_._2).toSet
      val fpB = Winnowing.winnow(doc(), 4, 4).map(_._2).toSet
      assert((fpA intersect fpB).nonEmpty, s"trial $trial")
    }
  }

  test("fingerprints: null/short text yields no rows, not an NPE") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, null: String), (3L, ""), (4L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(df, "doc_id", "text", k = 4, w = 4)
    val ids = fp.select("doc_id").distinct().as[Long].collect().toSet
    assert(ids == Set(4L)) // only the 10-token doc has 4-grams
  }

  test("passage overlap: copied passage found, unrelated docs not paired") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three four five six $passage seven eight nine ten"),
      (2L, s"uno dos tres cuatro cinco seis $passage siete ocho nueve diez"),
      (3L, "red green blue yellow purple orange cyan magenta lime teal navy")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.passageOverlapPairs(docs, "doc_id", "text",
      k = 4, w = 4, minShared = 2, maxDocFreq = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    val (_, _, shared, containment) = pairs.head
    assert(shared >= 2L)
    assert(containment > 0.0 && containment <= 1.0)
  }

  test("source overlap matrix: the re-crawled feed pair dominates") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      // feedA and feedB share a long passage (a re-crawl); feedC is clean
      (1L, s"one two three four $passage five six seven eight", "feedA"),
      (2L, s"uno dos tres cuatro $passage cinco seis siete ocho", "feedB"),
      (3L, "red green blue yellow purple orange cyan magenta lime teal", "feedC"),
      (4L, "north south east west up down left right fore aft", "feedA")
    ).toDF("doc_id", "text", "source")
    val m = Winnowing.sourceOverlapMatrix(docs, "doc_id", "text", "source",
      k = 4, w = 4, maxDocFreq = 50)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(m.keySet === Set(("feedA", "feedB")),
      s"only the re-crawl pair may overlap: ${m.keySet}")
    val (shared, containment) = m(("feedA", "feedB"))
    assert(shared >= 2L)
    assert(containment > 0.0 && containment <= 1.0)
  }

  test("split leakage: only cross-split near-dup pairs surface") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // three near-dup CLUSTERS so that, whatever the hash deals, at least
    // one pair crosses splits under an adversarial-free check: we assert
    // against the independently computed split assignment, not luck
    val docs = (0L until 30L).map(i =>
      (i, s"$passage unique${i % 3}a unique${i % 3}b unique${i % 3}c")).toDF("doc_id", "text")
    val weights = Seq(500, 250, 250)
    val splits = Sampling.trainValTestSplit(
      docs.select(col("doc_id")), "doc_id", weights, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allPairs = Winnowing.passageOverlapPairs(docs, "doc_id", "text",
      k = 4, w = 4, minShared = 2, maxDocFreq = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = allPairs.filter { case (a, b) => splits(a) != splits(b) }
    val got = Winnowing.splitLeakagePairs(docs, "doc_id", "text",
      weights, seed = 1L, k = 4, w = 4, minShared = 2, maxDocFreq = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(t => (t._1, t._2)).toSet === expected)
    // emitted split labels agree with the assignment, and differ pairwise
    got.foreach { case (a, b, sa, sb) =>
      assert(sa == splits(a) && sb == splits(b) && sa != sb)
    }
    assert(expected.nonEmpty, "fixture must actually exercise the cross-split case")
  }

  test("doc-frequency cap drops ubiquitous fingerprints (skew bound)") {
    import spark.implicits._
    // 20 docs all sharing one boilerplate passage + one genuine dup pair
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val base = (1L to 20L).map(i =>
      (i, s"$boiler filler$i word$i token$i item$i thing$i part$i bit$i end$i"))
    val docs = (base :+ (21L, base.head._2)).toDF("doc_id", "text")
    val capped = Winnowing.passageOverlapPairs(docs, "doc_id", "text",
      k = 4, w = 4, minShared = 2, maxDocFreq = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // boilerplate-only pairs are pruned (its fingerprints sit in 21 docs);
    // the verbatim duplicate still shares its unique filler fingerprints
    assert(capped == Set((1L, 21L)))
  }
}
