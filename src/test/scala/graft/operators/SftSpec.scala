package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SftSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    // conversation 1, out of order on purpose — assembly must sort
    (1L, 1L, "assistant", "Hi there."),
    (1L, 0L, "user", "Hello"),
    (1L, 2L, "user", "Bye"),
    // conversation 2, single turn
    (2L, 0L, "assistant", "Solo"))
    .toDF("conv", "idx", "role", "text")

  test("assemble: template rendering, span offsets, train flags") {
    val got = Sft.assemble(turns, "conv", "idx", "role", "text")
      .orderBy("conversation_id")
    val rows = got.select("conversation_id", "n_turns", "rendered")
      .as[(Long, Long, String)].collect()
    assert(rows(0) === ((1L, 3L,
      "<|im_start|>user\nHello<|im_end|>\n" +
        "<|im_start|>assistant\nHi there.<|im_end|>\n" +
        "<|im_start|>user\nBye<|im_end|>\n")))
    assert(rows(1) === ((2L, 1L, "<|im_start|>assistant\nSolo<|im_end|>\n")))

    val spans = got.filter($"conversation_id" === 1L)
      .select(explode($"spans").as("sp")).select("sp.*")
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect()
    // turn 0: "<|im_start|>user\nHello<|im_end|>\n" = 12+4+1+5+11 = 33
    assert(spans(0) === ((0L, "user", 0L, 33L, 17L, 22L, false)))
    // turn 1 starts at 33; rendered len 12+9+1+9+11 = 42; content 9 chars
    assert(spans(1) === ((1L, "assistant", 33L, 75L, 55L, 64L, true)))
    assert(spans(2) === ((2L, "user", 75L, 106L, 92L, 95L, false)))
    // the content interval must slice back to the turn text exactly
    val sliced = got.select(explode($"spans").as("sp"), $"rendered")
      .select(expr("substring(rendered, sp.content_start + 1, " +
        "sp.content_end - sp.content_start)").as("cut"),
        $"sp.turn_idx", $"sp.role")
      .as[(String, Long, String)].collect().map(_._1).toSet
    assert(sliced === Set("Hello", "Hi there.", "Bye", "Solo"))
  }

  test("dedupExact: min-id survivor, copy counts, hash key") {
    val convs = Seq((10L, "same words"), (7L, "same words"),
      (3L, "other words"))
      .toDF("conversation_id", "rendered")
    val got = Sft.dedupExact(convs, "conversation_id", "rendered")
      .select("conversation_id", "n_convs").as[(Long, Long)]
      .collect().toSet
    assert(got === Set((7L, 2L), (3L, 1L)))
  }

  test("preferencePairs: argmax/argmin, tie determinism, flat spread drops") {
    val cands = Seq(
      // prompt 1: clear spread
      (1L, 10L, "weak", 2L), (1L, 11L, "strong", 9L), (1L, 12L, "mid", 5L),
      // prompt 2: score tie at the top — larger cand_id wins chosen,
      // smaller wins rejected (the struct tie-break)
      (2L, 20L, "a", 7L), (2L, 21L, "b", 7L), (2L, 22L, "c", 1L),
      // prompt 3: flat spread — must emit nothing
      (3L, 30L, "x", 4L), (3L, 31L, "y", 4L))
      .toDF("prompt_id", "cand_id", "text", "score")
    val got = Sft.preferencePairs(cands, "prompt_id", "cand_id", "text",
        "score")
      .select("prompt_id", "n_candidates", "chosen_id", "chosen_text",
        "chosen_score", "rejected_id", "rejected_score")
      .as[(Long, Long, Long, String, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 3L, 11L, "strong", 9L, 10L, 2L),
      (2L, 3L, 21L, "b", 7L, 22L, 1L)))
  }

  test("preferencePairs: unscored candidates drop, prompt survives") {
    // a null score must not null the spread filter and discard the
    // prompt's perfectly good scored pair
    val cands = Seq(
      (1L, 10L, "good", Some(9L)), (1L, 11L, "bad", Some(2L)),
      (1L, 12L, "unscored", None))
      .toDF("prompt_id", "cand_id", "text", "score")
    val got = Sft.preferencePairs(cands, "prompt_id", "cand_id", "text",
        "score")
      .select("prompt_id", "n_candidates", "chosen_id", "rejected_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L, 10L, 11L)))
  }

  test("assemble: null turn text/role reads as empty, offsets stay exact") {
    val withNull = Seq(
      (1L, 0L, "user", Option("hi")),
      (1L, 1L, "assistant", None: Option[String]),
      (1L, 2L, "user", Option("bye")))
      .toDF("conv", "idx", "role", "text")
    val got = Sft.assemble(withNull, "conv", "idx", "role", "text")
    val rendered = got.select("rendered").as[String].head()
    assert(rendered ===
      "<|im_start|>user\nhi<|im_end|>\n" +
        "<|im_start|>assistant\n<|im_end|>\n" +
        "<|im_start|>user\nbye<|im_end|>\n")
    val spans = got.select(explode($"spans").as("sp")).select("sp.*")
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect()
    // the null turn renders empty: its content interval collapses to a
    // point, and the FOLLOWING turn's offsets are exact, not null
    // (the non-null Long decode above already proves no null offsets)
    assert(spans(1)._5 === spans(1)._6) // content_start == content_end
    assert(spans(2)._3 === spans(1)._4) // turn 2 starts where turn 1 ends
  }

  test("assembleTokenSpans: ChatML token layout from frozen-BPE counts") {
    val merges = BpeTokenizer.frozenMerges
    val ranks = merges.zipWithIndex.toMap
    // independent per-turn expected counts: driver-side encodeWord over
    // the cleaned (lower/split) words — the same pure function the UDF
    // broadcasts, applied outside Spark
    def nTok(text: String): Long =
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => BpeTokenizer.encodeWord(w, ranks).length.toLong).sum
    val got = Sft.assembleTokenSpans(turns, "conv", "idx", "role", "text",
        merges)
      .orderBy("conversation_id")
    val conv1 = got.filter($"conversation_id" === 1L)
      .select(explode($"spans").as("sp"), $"n_tokens", $"n_turns")
    val spans = conv1.select("sp.*")
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect()
    val texts = Seq("Hello", "Hi there.", "Bye") // index order
    var cursor = 0L
    texts.zipWithIndex.foreach { case (txt, i) =>
      val k = nTok(txt)
      val (idx, role, st, en, cs, ce, train) = spans(i)
      assert(idx === i.toLong)
      assert(st === cursor, s"turn $i start")
      assert(en === cursor + k + Sft.TurnOverheadTokens, s"turn $i end")
      assert(cs === st + Sft.TurnPrefixTokens)
      assert(ce === en - Sft.TurnSuffixTokens)
      assert(ce - cs === k, s"turn $i content width == token count")
      assert(train === (role == "assistant"))
      cursor = en
    }
    val (nTokens, nTurns) = conv1.select("n_tokens", "n_turns")
      .as[(Long, Long)].head()
    assert(nTokens === cursor && nTurns === 3L)
  }

  test("packTokensWithMasks: capacity division, split flags, global offsets") {
    val merges = BpeTokenizer.frozenMerges
    val assembled = Sft.assembleTokenSpans(turns, "conv", "idx", "role",
      "text", merges)
    val lens = assembled.orderBy("conversation_id")
      .select("conversation_id", "n_tokens").as[(Long, Long)].collect()
    // capacity chosen to FORCE a split: conv 1 alone exceeds it
    val cap = lens(0)._2 - 1
    val got = Sft.packTokensWithMasks(assembled, cap)
      .orderBy("conversation_id", "turn_idx")
      .select("conversation_id", "seq_id", "is_split", "g_start", "g_end")
      .as[(Long, Long, Boolean, Long, Long)].collect()
    // conv 1 starts the stream at 0 → seq 0, split (crosses cap)
    assert(got.filter(_._1 == 1L).forall(r => r._2 == 0L && r._3))
    // conv 2 starts at conv 1's total
    val c2 = got.filter(_._1 == 2L)
    assert(c2.head._4 === lens(0)._2)
    assert(c2.head._2 === lens(0)._2 / cap)
    // global spans tile the stream: widths sum to total tokens
    assert(got.map(r => r._5 - r._4).sum === lens.map(_._2).sum)
  }

  test("bestOfN: ranks, margins, flat/null contracts, pair agreement") {
    val cands = Seq(
      (1L, 10L, "weak", Some(2L)), (1L, 11L, "strong", Some(9L)),
      (1L, 12L, "mid", Some(5L)), (1L, 13L, "unscored", None),
      // prompt 2: top tie — larger cand_id ranks first (pair tie-break)
      (2L, 20L, "a", Some(7L)), (2L, 21L, "b", Some(7L)),
      (2L, 22L, "c", Some(1L)),
      // prompt 3: flat spread — emits nothing
      (3L, 30L, "x", Some(4L)), (3L, 31L, "y", Some(4L)))
      .toDF("prompt_id", "cand_id", "text", "score")
    val got = Sft.bestOfN(cands, "prompt_id", "cand_id", "text", "score",
        k = 2)
      .select("prompt_id", "rank", "cand_id", "score", "margin_next",
        "margin_worst", "n_candidates")
      .as[(Long, Long, Long, Long, Option[Long], Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 1L, 11L, 9L, Some(4L), 7L, 3L), // unscored dropped: n = 3
      (1L, 2L, 12L, 5L, Some(3L), 3L, 3L),
      (2L, 1L, 21L, 7L, Some(0L), 6L, 3L),
      (2L, 2L, 20L, 7L, Some(6L), 6L, 3L)))
    // rank 1 must equal preferencePairs' chosen on every emitted prompt
    val chosen = Sft.preferencePairs(cands, "prompt_id", "cand_id", "text",
        "score")
      .select("prompt_id", "chosen_id").as[(Long, Long)].collect().toSet
    assert(got.filter(_._2 == 1L).map(r => (r._1, r._3)).toSet === chosen)
    // k past the candidate count: margin_next NULL on the last candidate
    val deep = Sft.bestOfN(cands.filter($"prompt_id" === 1L), "prompt_id",
        "cand_id", "text", "score", k = 10)
      .orderBy("rank")
      .select("rank", "margin_next").as[(Long, Option[Long])].collect()
    assert(deep.length === 3 && deep.last._2.isEmpty)
  }

  test("hashedEmbedding: fixed arithmetic buckets/signs, case-folded, empty→zero") {
    // independent driver-side replay of the documented formula
    def expected(text: String, dim: Int): Seq[Double] = {
      val v = Array.fill(dim)(0.0)
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).foreach { t =>
        val b = ((3L * t.length + 7L * t.head.toLong +
          13L * t.last.toLong) % dim).toInt
        v(b) += (if ((t.length + t.head.toLong) % 2 == 0) 1.0 else -1.0)
      }
      v.toSeq
    }
    val df = Seq("The quick brown fox", "aa AA aa", "  ", "x")
      .toDF("text")
      .select(col("text"),
        Similarity.hashedEmbedding(col("text"), 16).as("v"))
    val got = df.select("text", "v").as[(String, Seq[Double])].collect()
    got.foreach { case (text, v) =>
      assert(v === expected(text, 16), s"text=<$text>")
    }
    // case variants collide (cleanTokens lowers): three copies of "aa"
    // land in ONE bucket with sign −1 ((2 + 97) % 2 == 1)
    val vs = got.toMap
    assert(vs("aa AA aa")(vs("aa AA aa").indexWhere(_ != 0.0)) === -3.0)
    assert(vs("  ").forall(_ === 0.0))
  }

  test("normalizedConvText: index order, lowercase, template excluded") {
    val got = Sft.normalizedConvText(turns, "conv", "idx", "text")
      .orderBy("conversation_id")
      .select("conversation_id", "n_turns", "conv_text")
      .as[(Long, Long, String)].collect()
    assert(got.toSeq === Seq((1L, 3L, "hello hi there. bye"),
      (2L, 1L, "solo")))
  }
}
