package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT / conversation data preparation — the post-training corpus
  * family: instruction-tuning data arrives as flat (conversation, turn,
  * role, text) rows and must leave as rendered training documents with
  * per-span loss masks, deduplicated at the CONVERSATION level.
  * Beyond-reference extension (the reference pipeline ends at
  * pre-training-style curation); composes with the [[Dedup]] ladder.
  *
  * Everything is declarative Spark: assembly is ONE combining aggregate
  * on the conversation key (turns sort in-array by index — no window,
  * no second shuffle), template rendering and span arithmetic are
  * higher-order array functions over the assembled turns (per-row,
  * zero shuffle, codegen-friendly), and dedup keys are hashes so no
  * rendered text crosses an exchange. At 100 TB the shape holds: one
  * shuffle keyed on conversation_id, then per-row work.
  */
object Sft {

  /** The frozen chat template (ChatML-style, the de-facto public
    * format): `<|im_start|>ROLE\nTEXT<|im_end|>\n` per turn, turns
    * concatenated in index order. Frozen LITERALS — span offsets are
    * derived from these strings, and a drifting template silently
    * corrupts every stored loss mask. */
  val ImStart = "<|im_start|>"
  val ImEnd = "<|im_end|>\n"

  /** One turn rendered under the template. */
  def renderTurn(role: Column, text: Column): Column =
    concat(lit(ImStart), role, lit("\n"), text, lit(ImEnd))

  /** Assemble conversations from turn rows: one row per conversation
    * with `turns` (index-sorted structs), `rendered` (the full template
    * string), `n_turns`, and `spans` — per turn the char interval
    * [start_char, end_char) of its rendered form inside `rendered`,
    * the [content_start, content_end) sub-interval of the turn TEXT
    * alone (what a loss mask actually covers — template scaffolding is
    * never trained on), and `train` = role == `trainRole`.
    *
    * Span starts are prefix sums of rendered-turn lengths, computed
    * per row with `aggregate(slice(...))` — O(turns²) per conversation,
    * which is the right trade: conversations are short (tens of turns)
    * and the alternative struct-state aggregate breaks whole-stage
    * codegen for every consumer downstream. Turn indices must be
    * unique per conversation (the sort key). */
  def assemble(turns: DataFrame, convCol: String, idxCol: String,
               roleCol: String, textCol: String,
               trainRole: String = "assistant"): DataFrame = {
    // a NULL role/text would both vanish from the concatenated render
    // (array_join skips nulls) AND null the length prefix sums — every
    // later span offset in the conversation would silently corrupt. A
    // null field reads as "" instead: the turn still renders (empty
    // content span) and every offset stays exact.
    val sortedTurns = array_sort(collect_list(struct(
      col(idxCol).cast("long").as("turn_idx"),
      coalesce(col(roleCol), lit("")).as("role"),
      coalesce(col(textCol), lit("")).as("text"))))
    val rend = (t: Column) =>
      renderTurn(t.getField("role"), t.getField("text"))
    turns.groupBy(col(convCol).as("conversation_id"))
      .agg(sortedTurns.as("turns"))
      .withColumn("__lens",
        transform(col("turns"), t => length(rend(t)).cast("long")))
      .withColumn("rendered",
        array_join(transform(col("turns"), rend), ""))
      .withColumn("n_turns", size(col("turns")).cast("long"))
      .withColumn("spans", transform(col("turns"), (t, i) => {
        val start = aggregate(slice(col("__lens"), lit(1), i),
          lit(0L), (a, x) => a + x)
        val end = start + get(col("__lens"), i)
        val cStart = start + lit(ImStart.length.toLong) +
          length(t.getField("role")).cast("long") + lit(1L)
        val cEnd = end - lit(ImEnd.length.toLong)
        struct(t.getField("turn_idx").as("turn_idx"),
          t.getField("role").as("role"),
          start.as("start_char"), end.as("end_char"),
          cStart.as("content_start"), cEnd.as("content_end"),
          (t.getField("role") === lit(trainRole)).as("train"))
      }))
      .drop("__lens")
  }

  /** Conversation-level EXACT dedup over any conversation-text column:
    * group on the 256-bit content hash (key-only shuffle — rendered
    * text never crosses an exchange, the lineDedup discipline), keep
    * the minimum id, count the copies. Output: (fp, conversation_id,
    * n_convs). */
  def dedupExact(convs: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    convs.groupBy(sha2(col(textCol), 256).as("fp"))
      .agg(min(col(idCol)).as("conversation_id"),
        count(lit(1)).as("n_convs"))

  /** Pack [[assemble]]d conversations into fixed-capacity training
    * sequences and carry every loss-mask span through to its GLOBAL
    * position in the packed character stream — the step that makes the
    * spans trainer-consumable: after packing, a span's in-sequence
    * offset is `g_* - seq_id * capacity`, and a span crossing a
    * sequence boundary belongs to a split conversation (`is_split`).
    * Capacity counts CHARS of the rendered template (swap a fitted
    * tokenizer's count upstream for token-exact packing — the
    * arithmetic is identical). Distributed prefix sum, no global
    * window; one explode after the per-row math. */
  def packWithMasks(assembled: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val withLen = assembled.select(col("conversation_id"),
      length(col("rendered")).cast("long").as("n_chars"), col("spans"))
    val cum = PrefixSum.withPrefixSum(withLen, "conversation_id",
      "n_chars", out = "__cum")
    cum.withColumn("__g0", col("__cum") - col("n_chars"))
      // `div` = long integer division, the packSequences discipline
      .withColumn("seq_id", expr(s"__g0 div ${capacity}L"))
      .withColumn("is_split", col("n_chars") > 0 &&
        expr(s"(__cum - 1) div ${capacity}L") =!= col("seq_id"))
      .select(col("conversation_id"), col("n_chars"), col("seq_id"),
        col("is_split"), col("__g0"), explode(col("spans")).as("sp"))
      .select(col("conversation_id"), col("n_chars"), col("seq_id"),
        col("is_split"),
        col("sp.turn_idx").as("turn_idx"), col("sp.role").as("role"),
        (col("__g0") + col("sp.start_char")).as("g_start"),
        (col("__g0") + col("sp.end_char")).as("g_end"),
        (col("__g0") + col("sp.content_start")).as("g_content_start"),
        (col("__g0") + col("sp.content_end")).as("g_content_end"),
        col("sp.train").as("train"))
  }

  /** Preference-pair assembly (DPO/RLHF prep): per prompt, CHOSEN is
    * the (score, candidate_id)-lexicographic max and REJECTED the min —
    * struct min/max in ONE combining aggregate on the prompt key, no
    * window, deterministic ties. Prompts without a strict score spread
    * (max score == min score) emit nothing: a pair with no preference
    * signal trains nothing, and emitting chosen == rejected would
    * poison a DPO loss silently. UNSCORED candidates (null score) are
    * dropped up front — a null would otherwise win min(struct) (nulls
    * sort first) and null the spread filter, silently discarding a
    * prompt whose scored candidates carry a perfectly good pair;
    * `n_candidates` therefore counts SCORED candidates. */
  def preferencePairs(cands: DataFrame, promptCol: String,
                      candIdCol: String, textCol: String,
                      scoreCol: String): DataFrame =
    cands.filter(col(scoreCol).isNotNull)
      .groupBy(col(promptCol).as("prompt_id"))
      .agg(
        max(struct(col(scoreCol).as("s"), col(candIdCol).as("i"),
          col(textCol).as("t"))).as("__c"),
        min(struct(col(scoreCol).as("s"), col(candIdCol).as("i"),
          col(textCol).as("t"))).as("__r"),
        count(lit(1)).as("n_candidates"))
      .filter(col("__c.s") > col("__r.s"))
      .select(col("prompt_id"), col("n_candidates"),
        col("__c.i").as("chosen_id"), col("__c.t").as("chosen_text"),
        col("__c.s").as("chosen_score"),
        col("__r.i").as("rejected_id"), col("__r.t").as("rejected_text"),
        col("__r.s").as("rejected_score"))

  /** Concatenated NORMALIZED turns — the conversation-level dedup key
    * the fuzzy ladder runs on: turn texts sorted by index, joined with
    * single spaces, lowercased (template scaffolding and role labels
    * deliberately excluded — two conversations with the same words are
    * duplicates no matter how they were rendered). Emits
    * (conversation_id, n_turns, conv_text); feed `conv_text` to
    * [[Dedup.minhashNearDupPairs]] / [[Dedup.ngramJaccardPairs]] for
    * the near-dup pass and to [[dedupExact]] for the exact one. */
  def normalizedConvText(turns: DataFrame, convCol: String,
                         idxCol: String, textCol: String): DataFrame =
    turns.groupBy(col(convCol).as("conversation_id"))
      .agg(count(lit(1)).as("n_turns"),
        lower(array_join(transform(
          array_sort(collect_list(struct(col(idxCol).as("i"),
            col(textCol).as("t")))),
          x => x.getField("t")), " ")).as("conv_text"))
}
