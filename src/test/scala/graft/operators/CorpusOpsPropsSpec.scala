package graft.operators

import org.apache.spark.sql.functions._

/** Property tests: the round-3 operators against independent in-JVM
  * brute-force references over randomized inputs. */
class CorpusOpsPropsSpec extends graft.SparkSpec {

  test("sessionize ≡ sequential scan on 40 random event sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 40) {
      val gap = 1 + rnd.nextInt(20)
      val events = for {
        u <- 0L until (1 + rnd.nextInt(6)).toLong
        i <- 0 until rnd.nextInt(15)
      } yield (u, u * 1000 + i, rnd.nextInt(100).toLong)
      if (events.nonEmpty) {
        val got = Sessionize.withSessionIds(
            events.toDF("user_id", "event_id", "us"),
            Seq("user_id"), "us", "event_id", gap.toLong)
          .select("user_id", "event_id", "session_seq")
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        // reference: sort by (ts, event_id) per user, sequential gap scan
        events.groupBy(_._1).foreach { case (u, evs) =>
          var seq = 0L
          var prevTs = Long.MinValue
          evs.sortBy(e => (e._3, e._2)).foreach { case (_, eid, ts) =>
            if (seq == 0L || ts - prevTs > gap) seq += 1
            prevTs = ts
            assert(got((u, eid)) == seq,
              s"trial $trial user $u event $eid gap $gap: ${evs.sortBy(e => (e._3, e._2))}")
          }
        }
      }
    }
  }

  test("tfidf ≡ in-JVM reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = Array("ant", "bee", "cat", "dog", "elk", "fox")
    for (trial <- 1 to 10) {
      val docs = (0L until (2 + rnd.nextInt(8)).toLong).map { id =>
        val words = (0 until 1 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length)))
        (id, words.mkString(" "))
      }
      val k = 1 + rnd.nextInt(3)
      val got = TfIdf.topTerms(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(t => (t._2, t._3, t._4)).toList).toMap
      // reference computation
      val tf = docs.flatMap { case (id, text) =>
        text.split("\\s+").filter(_.nonEmpty).map(t => (id, t))
      }.groupBy(identity).view.mapValues(_.size).toMap
      val dfreq = tf.keys.groupBy(_._2).view.mapValues(_.map(_._1).toSet.size).toMap
      val n = docs.size.toDouble
      docs.foreach { case (id, text) =>
        val scored = text.split("\\s+").filter(_.nonEmpty).distinct.map { t =>
          val score = BigDecimal(tf((id, t)) * math.log(n / dfreq(t)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (t, score)
        }.sortBy { case (t, s) => (-s, t) }.take(k)
        val expected = scored.zipWithIndex.map { case ((t, s), i) => (t, (i + 1).toLong, s) }.toList
        assert(got.getOrElse(id, Nil) == expected, s"trial $trial doc $id: '$text'")
      }
    }
  }

  test("tfidf plan: document-frequency table joins back broadcast") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val plan = TfIdf.topTerms(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"df table should broadcast, plan:\n$plan")
  }

  test("packing ≡ sequential concat-and-split on 30 random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 30) {
      val cap = 1L + rnd.nextInt(50)
      val docs = (0L until (1 + rnd.nextInt(40)).toLong)
        .map(i => (i, rnd.nextInt(30).toLong)) // token counts incl. 0
      val got = Packing.packSequences(
          docs.toDF("doc_id", "n_tok"), "doc_id", "n_tok", cap)
        .select("doc_id", "seq_id", "is_split")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      // reference: walk docs in order with a running token cursor
      var cursor = 0L
      docs.foreach { case (id, n) =>
        val seq = cursor / cap
        val split = n > 0 && (cursor + n - 1) / cap != seq
        assert(got(id) == ((seq, split)),
          s"trial $trial cap $cap doc $id n=$n cursor=$cursor: got ${got(id)}")
        cursor += n
      }
    }
  }

  test("salted join ≡ plain join on random frames (dupes, nulls, missing keys)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 25) {
      val nSalts = 1 + rnd.nextInt(9)
      // probe: duplicate keys, null keys, keys with no build match
      val probe = (0 until 30 + rnd.nextInt(60)).map { i =>
        (if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(12).toLong),
          i.toLong)
      }.toDF("k", "pid")
      // build: some keys absent, some duplicated (join multiplies rows)
      val build = (0 until 10 + rnd.nextInt(15)).map { _ =>
        (rnd.nextInt(15).toLong, rnd.nextInt(100))
      }.toDF("k", "bval")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.toString()).toSeq
      val plain = canon(probe.join(build, Seq("k")))
      val salted = canon(Skew.saltedJoin(probe, build, Seq("k"), nSalts))
      assert(plain == salted, s"trial $trial numSalts=$nSalts")
    }
  }

  test("unigram log-prob ≡ in-JVM reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 15) {
      val docs = (0L until (3 + rnd.nextInt(8)).toLong).map { id =>
        (id, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val got = TextAnalysis.unigramLogProb(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
        .toMap
      // reference: corpus counts -> rounded log-probs -> exact decimal mean
      val toks = docs.flatMap { case (id, t) =>
        t.split("\\s+").filter(_.nonEmpty).map(id -> _)
      }
      val counts = toks.groupBy(_._2).view.mapValues(_.size).toMap
      val n = toks.size.toDouble
      def lp(term: String): BigDecimal =
        BigDecimal(math.log(counts(term) / n))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      docs.foreach { case (id, _) =>
        val mine = toks.filter(_._1 == id).map(t => lp(t._2))
        val (gn, glp) = got(id)
        assert(gn == mine.size, s"trial $trial doc $id token count")
        if (mine.isEmpty) assert(glp.isEmpty, s"trial $trial doc $id null score")
        else assert(math.abs(glp.get - mine.sum.toDouble / mine.size) < 1e-12,
          s"trial $trial doc $id score")
      }
    }
  }
}
