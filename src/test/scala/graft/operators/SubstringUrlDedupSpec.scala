package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the two round-6 dedup modes: exact repeated-substring
  * spans (anchor grams + island merge) and URL+content composite dedup. */
class SubstringUrlDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repeatedSpans finds a cross-document repeated span with exact boundaries") {
    // docs 1 and 2 share tokens 2..11 of doc 1 (a 10-token run); k=4
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      (1L, s"x1 y1 $shared z1 w1"),
      (2L, s"a2 b2 c2 $shared d2"),
      (3L, "nothing here repeats at all ever once only"))
    val out = SubstringDedup.repeatedSpans(d, "doc_id", "text", k = 4)
      .orderBy("doc_id", "start_tok")
      .collect()
    assert(out.length === 2)
    // doc 1: shared run is tokens 2..11 (0-based); doc 2: tokens 3..12
    assert(out(0).getLong(0) === 1L && out(0).getLong(1) === 2L &&
      out(0).getLong(2) === 11L && out(0).getLong(3) === 10L)
    assert(out(1).getLong(0) === 2L && out(1).getLong(1) === 3L &&
      out(1).getLong(2) === 12L && out(1).getLong(3) === 10L)
  }

  test("repeatedSpans catches WITHIN-document repeats and merges touching anchors") {
    // "p q r s" occurs twice inside one doc — corpus-wide count >= 2
    val d = docs((7L, "p q r s junk1 junk2 p q r s"),
      (8L, "totally unrelated words live here today"))
    val out = SubstringDedup.repeatedSpans(d, "doc_id", "text", k = 4)
      .orderBy("doc_id", "start_tok").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(7L, 7L))
    assert(out(0).getLong(1) === 0L && out(0).getLong(2) === 3L)
    assert(out(1).getLong(1) === 6L && out(1).getLong(2) === 9L)
  }

  test("repeatedSpans tokenization survives tabs/newlines (matches the UDF rule)") {
    val shared = "one two three four five six seven eight"
    val d = docs((1L, s"\t$shared\n"), (2L, s"$shared"))
    val out = SubstringDedup.repeatedSpans(d, "doc_id", "text", k = 8).collect()
    // both docs are exactly the shared 8 tokens: span 0..7 in each
    assert(out.length === 2)
    assert(out.forall(r => r.getLong(1) === 0L && r.getLong(2) === 7L))
  }

  test("adjacent-but-distinct repeats do NOT merge across an anchor gap") {
    // doc 1 = R1 ++ R2; R1 repeats in doc 2, R2 in doc 3. Anchors 1..7 of
    // doc 1 straddle the seam and are unique, so the maximal repeated
    // spans are [0,7] and [8,15] — merging them would claim a 16-token
    // span that occurs nowhere else.
    val r1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    val r2 = "b1 b2 b3 b4 b5 b6 b7 b8"
    val d = docs((1L, s"$r1 $r2"), (2L, r1), (3L, r2))
    val spans = SubstringDedup.repeatedSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq === Seq((1L, 0L, 7L), (1L, 8L, 15L),
      (2L, 0L, 7L), (3L, 0L, 7L)))
    // and removal keeps doc 1's copies as canonical, empties docs 2 and 3
    val clean = SubstringDedup.removeRepeatedSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(clean.toSeq === Seq((1L, s"$r1 $r2", 0L), (2L, "", 8L), (3L, "", 8L)))
  }

  test("mixed-witness merged span: removal still elects per GRAM, not per span text") {
    // doc 1 = t0..t8; doc 2 = t0..t7; doc 3 = t1..t8 (k=8). Doc 1's two
    // anchors merge into a 9-token coverage span whose union text occurs
    // NOWHERE else — span-text election would make doc 2's and doc 3's
    // genuine duplicates their own canonicals and remove nothing.
    val t = (0 to 8).map(i => s"t$i")
    val d = docs(
      (1L, t.mkString(" ")),
      (2L, t.take(8).mkString(" ")),
      (3L, t.drop(1).mkString(" ")))
    val spans = SubstringDedup.repeatedSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 reports the merged COVERAGE span (every 8-window repeats;
    // the 9-token union text itself does not — that is the contract)
    assert(spans.toSeq === Seq((1L, 0L, 8L), (2L, 0L, 7L), (3L, 0L, 7L)))
    val clean = SubstringDedup.removeRepeatedSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // both grams' canonical windows live in doc 1 → doc 1 intact, the
    // true duplicates in docs 2 and 3 removed entirely
    assert(clean.toSeq === Seq((1L, t.mkString(" "), 0L),
      (2L, "", 8L), (3L, "", 8L)))
  }

  test("repeatedSpans ≡ brute-force anchor reference on random corpora") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(4242)
    val vocab = Array("aa", "bb", "cc", "dd") // tiny vocab → real collisions
    for (trial <- 1 to 12) {
      val k = 2 + rnd.nextInt(3)
      val corpus = (0L until (2 + rnd.nextInt(5)).toLong).map { id =>
        (id, (0 until rnd.nextInt(14)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val got = SubstringDedup.repeatedSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === bruteSpans(corpus, k).toSet, s"trial $trial k=$k docs=$corpus")
    }
  }

  test("removeRepeatedSpans ≡ reference removal on random corpora (incl. overlaps)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(777)
    val vocab = Array("aa", "bb", "cc")
    for (trial <- 1 to 8) {
      val k = 2 + rnd.nextInt(2)
      val corpus = (0L until (2 + rnd.nextInt(4)).toLong).map { id =>
        (id, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val got = SubstringDedup.removeRepeatedSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val toks = corpus.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      // reference removal at GRAM granularity: each repeated k-gram keeps
      // its (doc·2^20+pos)-minimal occurrence; a position drops iff some
      // redundant window covers it and no canonical window does
      val occs = for {
        (id, tk) <- toks.toSeq; i <- 0 to tk.length - k if tk.length >= k
      } yield (tk.slice(i, i + k), id, i)
      val flagged = occs.groupBy(_._1).values.filter(_.size >= 2).flatMap { o =>
        val canon = o.minBy { case (_, id, p) => id * 1048576L + p }
        o.map(x => (x._2, x._3, x == canon))
      }.toSeq
      for ((id, tk) <- toks) {
        val can = flagged.collect { case (d, p, true) if d == id => (p, p + k - 1) }
        val red = flagged.collect { case (d, p, false) if d == id => (p, p + k - 1) }
        def covered(ws: Seq[(Int, Int)], p: Int) = ws.exists(w => p >= w._1 && p <= w._2)
        val removed = (p: Int) => covered(red, p) && !covered(can, p)
        val wantClean = tk.zipWithIndex.collect { case (t, p) if !removed(p) => t }
          .mkString(" ")
        val wantRemoved = tk.indices.count(removed).toLong
        assert(got(id) === ((wantClean, wantRemoved)),
          s"trial $trial k=$k doc $id docs=$corpus")
      }
    }
  }

  /** Brute-force reference: count every k-gram corpus-wide, mark repeated
    * anchor positions, merge CONSECUTIVE anchors into maximal spans. */
  private def bruteSpans(corpus: Seq[(Long, String)],
                         k: Int): Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int].withDefaultValue(0)
    for ((_, tk) <- toks; i <- 0 to tk.length - k if tk.length >= k)
      counts(tk.slice(i, i + k)) += 1
    toks.flatMap { case (id, tk) =>
      if (tk.length < k) Nil
      else {
        val rep = (0 to tk.length - k).filter(i => counts(tk.slice(i, i + k)) >= 2)
        val islands = rep.foldLeft(List.empty[(Int, Int)]) {
          case ((st, en) :: rest, p) if p == en + 1 => (st, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.reverse
        islands.map { case (st, en) =>
          (id, st.toLong, (en + k - 1).toLong, (en + k - st).toLong) }
      }
    }
  }

  test("hash-keyed scale path agrees with the exact string-keyed path on real data") {
    val d = spark.read.parquet(s"${testDataDir()}/documents.parquet")
    for (k <- Seq(4, 8)) {
      val exact = SubstringDedup.repeatedSpans(d, "doc_id", "text", k = k)
        .orderBy("doc_id", "start_tok").collect().toSeq
      val hashed = SubstringDedup.repeatedSpans(d, "doc_id", "text", k = k,
        hashKeys = true).orderBy("doc_id", "start_tok").collect().toSeq
      assert(hashed === exact, s"k=$k: hash-keyed spans diverge")
      assert(exact.nonEmpty, s"k=$k: fixture should contain repeated spans")
    }
  }

  test("removeRepeatedSpans keeps one canonical copy, strips the rest") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs(
      (1L, s"x1 y1 $shared z1"),          // canonical (min doc_id, start 2)
      (2L, s"a2 $shared b2"),             // loses the span
      (3L, "no repeats in this one here at all"))
    val out = SubstringDedup.removeRepeatedSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out(0).getString(1) === s"x1 y1 $shared z1" && out(0).getLong(2) === 0L)
    assert(out(1).getString(1) === "a2 b2" && out(1).getLong(2) === 8L)
    assert(out(2).getLong(2) === 0L)
  }

  test("removeRepeatedSpans strips a WITHIN-doc second occurrence only") {
    val run = "p1 p2 p3 p4 p5 p6 p7 p8"
    val d = docs((5L, s"$run mid $run"),
      (6L, "unrelated filler words that never repeat anywhere at all"))
    val out = SubstringDedup.removeRepeatedSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === s"$run mid" && out(0).getLong(2) === 8L)
    assert(out(1).getLong(2) === 0L)
  }

  test("normalizeUrl strips scheme, www, query, fragment, trailing slash") {
    val s = spark; import s.implicits._
    val in = Seq(
      "https://www.Example.com/A/B/?utm_source=x&id=3#frag",
      "http://example.com/a/b",
      "example.com/a/b///",
      "https://sub.example.com/a/b?x=1",
      // pathological: newline inside the query string and before a
      // trailing slash — (?s)/\z keep replace-all == replace-first so
      // Spark and RE2-based engines still agree
      "https://example.com/a/b?x=1\nstill-query",
      "example.com/a/b/\n/").toDF("u")
    val got = in.select(Dedup.normalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got === Seq("example.com/a/b", "example.com/a/b",
      "example.com/a/b", "sub.example.com/a/b",
      "example.com/a/b", "example.com/a/b/\n"))
  }

  test("urlContentDedup collapses same-key+same-content only") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "https://www.site.com/p?a=1", "same text"),
      (2L, "http://site.com/p/", "same text"),   // same key, same content
      (3L, "http://site.com/p", "DIFFERENT"),    // same key, other content
      (4L, "http://other.com/p", "same text"))   // other key
      .toDF("doc_id", "url", "text")
    val out = Dedup.urlContentDedup(d, "url", "text", "doc_id")
      .orderBy("url_key", "content_md5").collect()
    assert(out.length === 3)
    val collapsed = out.find(_.getLong(2) === 1L).get
    assert(collapsed.getString(0) === "site.com/p" && collapsed.getLong(3) === 2L)
  }

  test("capstone URL stage is absorbed by min-id exact dedup (composition theorem)") {
    val sf = testDataDir()
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("url",
        concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang")))
    val without = CorpusPipeline.curate(base).orderBy("doc_id").collect()
    val withUrl = CorpusPipeline.curate(base,
      CorpusPipeline.Config(urlCol = Some("url"))).orderBy("doc_id").collect()
    assert(withUrl.toSeq === without.toSeq)
  }
}
