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

  test("normalizedConvText: index order, lowercase, template excluded") {
    val got = Sft.normalizedConvText(turns, "conv", "idx", "text")
      .orderBy("conversation_id")
      .select("conversation_id", "n_turns", "conv_text")
      .as[(Long, Long, String)].collect()
    assert(got.toSeq === Seq((1L, 3L, "hello hi there. bye"),
      (2L, 1L, "solo")))
  }
}
