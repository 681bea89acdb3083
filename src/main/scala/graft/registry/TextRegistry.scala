package graft
package registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{EventTime, GraftFunctions}
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.StreamingIngest
import SparkEntry._

/** Text query/oracle registry — one slice of the driver contract
  * surface, split out of the former 15k-line SparkEntry monolith so a
  * duplicated query-name literal can never silently shadow a pair out
  * of the sweep again (the round-17 q_text_chunks incident).
  * Query lambdas and oracle texts are verbatim moves; shared helpers
  * stay on [[SparkEntry]] (imported above). Composed — with a
  * cross-registry duplicate guard — in [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]]. */
private[graft] object TextRegistry extends QueryRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // All six stats project from ONE fused text_profile scan per row.
    "q_text_stats" -> ((s, dir) =>
      spread(t(s, dir, "documents"))
        .withColumn("__p", TextAnalysis.profile(col("text")))
        .select(col("doc_id"),
          col("__p.n_chars").cast("long").as("n_chars_actual"),
          coalesce(col("__p.n_tokens"), lit(0)).cast("long").as("n_tokens"),
          col("__p.n_bpeish").cast("long").as("n_bpeish"),
          col("__p.n_punct").cast("long").as("n_punct"),
          col("__p.n_stopwords").cast("long").as("n_stopwords"),
          when(col("__p.n_tokens") > 0,
            col("__p.n_nonspace").cast("double") / col("__p.n_tokens"))
            .otherwise(lit(0.0)).as("mean_token_len"))
        .orderBy(col("doc_id"))),


    // Self-trained unigram LM score (the CCNet-perplexity proxy): mean
    // rounded token log-prob, decimal-summed — corpus shuffles on
    // doc/term keys only, vocab table broadcast.
    "q_text_unigram_lp" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),


    // Bigram LM score — conditional log-probs c(w1 w2)/c(w1 ·), the next
    // perplexity proxy up: narrow bigram extraction, (doc, bigram)
    // shuffles only, AQE-sized probability join (bigram vocab is not
    // guaranteed driver-sized like the unigram vocab). Kept as the
    // ablation next to the interpolated trigram model below.
    "q_text_bigram_lp" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),


    // Interpolated trigram LM score — the CCNet/LLaMA-style quality
    // perplexity: λ70/20/10 mix of trigram/bigram/unigram conditionals,
    // each an IEEE-exact count ratio, ln pinned by the 6dp-round +
    // decimal-sum contract. Narrow n-gram transforms, n-gram-keyed
    // partial aggs, AQE-sized probability joins.
    "q_text_trigram_lp" -> ((s, dir) =>
      TextAnalysis.trigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),


    // Persistence twin of q_text_trigram_lp: train the three conditional
    // tables → save to parquet → load → score. Shares the trigram ORACLE
    // verbatim (doubles round-trip parquet bit-exactly), so the reloaded
    // LM must score hash-identically to the train-fresh one.
    "q_text_trigram_reload" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_trigram_model_"))
      val path = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_trigram_model_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      TextAnalysis.saveTrigramLm(TextAnalysis.trainTrigramLm(docs, "text"), path)
      TextAnalysis.scoreTrigramLm(TextAnalysis.loadTrigramLm(s, path),
        docs, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    // Per-doc 3-gram diversity (distinct-n in ppm): the integer-exact
    // repetition/garbage proxy — one narrow transform + one doc-keyed agg.
    "q_text_diversity" -> ((s, dir) =>
      TextAnalysis.ngramDiversity(t(s, dir, "documents"), "doc_id", "text",
        n = 3)
        .orderBy(col("doc_id"))),


    // CCNet perplexity terciles: head/middle/tail by trigram-LM score,
    // thresholds = exact percentiles over scored docs (ONE-ROW frame
    // crossed back), short docs in an explicit unscored bucket.
    "q_text_ppl_buckets" -> ((s, dir) =>
      TextAnalysis.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),


    // Corpus PMI collocations in floor-divided ppm — integer-exact
    // association ranking (exp(PMI)·1e6), no ln-double ever hashed. The
    // (pmi_ppm DESC, c12 DESC, w1, w2) order is total, so the top-100 cut
    // is deterministic cross-engine.
    "q_text_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(t(s, dir, "documents"), "text",
        minCount = 5, topK = 100)),


    // Per-class discriminative keywords by add-one-smoothed odds ratio in
    // floor-divided ppm over (lang, term) token counts — integer-exact
    // like the PMI score; per-class top-20 under a total order.
    "q_text_keywords" -> ((s, dir) =>
      TextAnalysis.classKeywords(t(s, dir, "documents"), "lang", "text",
        minCount = 5, topK = 20)
        .orderBy(col("cls"), col("odds_ppm").desc, col("a").desc, col("term"))),


    "q_text_langid" -> ((s, dir) =>
      TextAnalysis.withLangId(spread(t(s, dir, "documents")))
        .select(col("doc_id"), col("lang_pred"))
        .orderBy(col("doc_id"))),


    // HTML→text extraction (jusText-lite boilerplate removal) over a
    // synthetic crawl: every document wrapped in a real-page template
    // (head/title + style, link-only nav + ad div, link-heavy footer,
    // script noise, entities) and extracted back. The oracle recomputes
    // the expected content — constant h1 + text + uppercase twin — from
    // the source column directly, so parse/segment/classify/entity-decode
    // is hash-gated end-to-end (the synthetic-PNG playbook for text).
    "q_text_extract" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      operators.TextExtract.fromHtml(
        docs.select(col("doc_id"),
          operators.TextExtract.syntheticHtml(col("doc_id"), col("text"))
            .as("html")),
        "doc_id", "html")
        .orderBy(col("doc_id"))
    }),


    // Block-level view of the same pages: every segmented block's tag,
    // normalized text, non-ws/link char counts, word count, and
    // jusText-lite label, hash-matched against the template anatomy the
    // oracle reconstructs per document (7 blocks: title/nav/h1/p/div/
    // blockquote/footer). stop_ratio is reported by the operator but
    // not emitted here (stopword tokenization is not worth re-deriving
    // in SQL; the keep rule never consults it).
    "q_text_extract_blocks" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      operators.TextExtract.blocks(
        docs.select(col("doc_id"),
          operators.TextExtract.syntheticHtml(col("doc_id"), col("text"))
            .as("html")),
        "doc_id", "html")
        .select(col("doc_id"), col("idx").cast("long").as("idx"), col("tag"),
          col("text"), col("n_chars").cast("long").as("n_chars"),
          col("n_link_chars").cast("long").as("n_link_chars"),
          col("n_words").cast("long").as("n_words"), col("label"))
        .orderBy(col("doc_id"), col("idx"))
    }),


    // LANGUAGE-VARIANT clusters: pages sharing one x-default target are
    // one logical document across languages — the unit multilingual
    // dedup and parallel-corpus mining operate on. Cluster ledger:
    // member pages and distinct non-default languages; a cluster has 3
    // langs iff any member page is even (advertises fr).
    "q_lang_clusters" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val ex = docs.select(col("doc_id"),
        explode(graft.expr.HtmlExpressions.html_alternates(altFixtureHtml))
          .as("a"))
      val clusterOf = ex.filter(col("a.hreflang") === "x-default")
        .select(col("doc_id"), col("a.href").as("cluster"))
      ex.filter(col("a.hreflang") =!= "x-default")
        .select(col("doc_id"), col("a.hreflang").as("hreflang"))
        .join(clusterOf, Seq("doc_id"))
        .groupBy(col("cluster"))
        .agg(countDistinct(col("doc_id")).as("n_pages"),
          countDistinct(col("hreflang")).as("n_langs"))
        .orderBy(col("cluster"))
    }),


    // FENCED CODE extraction — the code/prose separation a Stack-style
    // pipeline runs on markdown-ish text: documents rebuilt with two
    // fenced blocks (one ```python-tagged, one bare), extraction via
    // regexp_extract_all + per-block pulls (fully declarative — no
    // custom expression needed for a regular grammar), every
    // (idx, lang, code) pinned by the word-slice oracle.
    "q_text_code_fences" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val doc = concat(
        array_join(slice(words, 1, 4), " "), lit(" ```python\n"),
        array_join(slice(words, 5, 4), " "), lit("\n``` mid ```\n"),
        array_join(slice(words, 9, 4), " "), lit("\n``` tail"))
      docs.select(col("doc_id"),
          posexplode(regexp_extract_all(doc,
            lit("(?s)```[a-z]*\\n.*?\\n```"), lit(0)))
            .as(Seq("idx", "blk")))
        .select(col("doc_id"), col("idx").cast("long").as("idx"),
          regexp_extract(col("blk"), "^```([a-z]*)", 1).as("lang"),
          regexp_extract(col("blk"), "(?s)\\n(.*)\\n```$", 1).as("code"))
        .orderBy(col("doc_id"), col("idx"))
    }),


    // MOJIBAKE repair (the ftfy core, deterministic): four of five
    // documents arrive with their unicode suffix CORRUPTED the way real
    // crawls corrupt it (UTF-8 bytes decoded as latin-1 — "Ã©" for é,
    // "â‚¬"-style C1 salads); fix_mojibake must restore the clean
    // construction bit-exactly via strict encode-back-and-decode, and
    // the uncorrupted control rows (id%5==0) must pass through
    // UNTOUCHED — the strict UTF-8 gate is what keeps legitimate
    // accents safe from false repair.
    "q_text_fix_mojibake" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val sfx = element_at(array(MojiSuffixes.map(lit): _*),
        pmod(col("doc_id"), lit(3)).cast("int") + 1)
      val clean = concat(col("text"), sfx)
      val corrupted = decode(encode(clean, "UTF-8"), "ISO-8859-1")
      val input = when(col("doc_id") % 5 === 0, clean).otherwise(corrupted)
      docs.select(col("doc_id"),
          graft.expr.MojibakeExpressions.fix_mojibake(input).as("fixed"))
        .orderBy(col("doc_id"))
    }),


    // Sentence segmentation (the unit between documents and tokens):
    // documents re-punctuated into 6-word sentences — first word
    // capitalized, terminator rotating . ! ? with '..' hard stops every
    // fifth and a leading "Dr. " abbreviation trap every fourth (which
    // the single-period guard must NOT split despite the following
    // capital) — then split back by the codegen rule-based segmenter.
    // Round-trip exact: the oracle rebuilds every sentence string from
    // the construction. The construction NEVER ends a sentence with a
    // bare '.' after a guard-listed word (a group whose last word is an
    // abbreviation gets '!' instead): the engine's guard would merge
    // such a sentence into the next while the oracle's rebuild splits
    // them, so at a scale factor whose vocabulary happens to land "no"/
    // "st"/"fig" before a '.' terminator the round-trip would break —
    // agreement is by construction, not by fixture luck.
    "q_text_sentences" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val guardWords = Seq("dr", "mr", "mrs", "ms", "prof", "sr", "jr",
        "st", "no", "vs", "etc", "eg", "ie", "fig", "al")
      // the capitalized-word array and word count are HOISTED into their
      // own projection: referenced from inside the per-sentence-group
      // lambda below they would re-evaluate PER GROUP — the whole O(W)
      // transform re-run for each of the W/6 groups, O(W²) per document
      // in interpreted-HOF land (guide §1.2 step 2: per-task work). As
      // separate multi-referenced non-cheap aliases CollapseProject
      // keeps the boundary, so each is computed once per row.
      val caps = col("__caps")
      val sentences = transform(sequence(lit(0), col("__ng") - 1), g => {
        val lastWord = element_at(caps,
          least((g + 1) * lit(6), col("__nw")).cast("int"))
        val guardHit = lower(regexp_extract(lastWord, "([A-Za-z]+)$", 1))
          .isin(guardWords: _*)
        concat(
          when(g % 4 === 0, lit("Dr. ")).otherwise(lit("")),
          array_join(slice(caps, g * 6 + 1, lit(6)), " "),
          when(g % 5 === 0, lit(".."))
            .when(pmod(col("doc_id") + g, lit(3)) === 0 && guardHit, lit("!"))
            .otherwise(element_at(array(lit("."), lit("!"), lit("?")),
              pmod(col("doc_id") + g, lit(3)).cast("int") + 1)))
      })
      docs
        .withColumn("__caps",
          transform(filter(split(col("text"), " "), w => length(w) > 0),
            (w, i) => when(i % 6 === 0,
              concat(upper(substring(w, 1, 1)), substring(w, 2, 100000)))
              .otherwise(w)))
        .withColumn("__nw", size(col("__caps")))
        .withColumn("__ng", ((col("__nw") + lit(5)) / lit(6)).cast("int"))
        .select(col("doc_id"),
          graft.expr.SentenceExpressions.split_sentences(
            array_join(sentences, " ")).as("__s"))
        // lineage cut before the explode: InferFiltersFromGenerate
        // otherwise pushes a `size(__s) > 0` guard below the projection
        // chain by SUBSTITUTING the whole sentence construction into the
        // filter — the entire build evaluated twice per row. One
        // materialization of the 2-column (doc_id, __s) frame is far
        // cheaper (guide §3.3: materialize to truncate a plan the
        // optimizer mangles).
        .localCheckpoint()
        .select(col("doc_id"),
          posexplode(col("__s")).as(Seq("sidx", "sentence")))
        .select(col("doc_id"), col("sidx").cast("long").as("sidx"),
          col("sentence"))
        .orderBy(col("doc_id"), col("sidx"))
    }),


    // Extraction feeding the curation ladder: html → extracted text →
    // exact dedup ON THE EXTRACTED TEXT (the constant h1 keeps extraction
    // a pure function of `text`, so exact-dup documents stay exact dups
    // through the HTML round-trip) → fused-profile token count → quality
    // floor → per-lang rollup. One hash-gated chain across the
    // extract→curate interface.
    "q_text_extract_pipeline" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val ext = docs.select(col("doc_id"), col("lang"),
        graft.expr.HtmlExpressions.html_content_text(
          operators.TextExtract.syntheticHtml(col("doc_id"), col("text")))
          .as("extracted"))
      val deduped = operators.Dedup.exactDedup(ext, Seq("extracted"), "doc_id")
      deduped
        .withColumn("n_tok",
          TextAnalysis.tokenCount(col("extracted")).cast("long"))
        .filter(col("n_tok") >= 32)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
        .orderBy(col("lang"))
    }),


    // Character-entropy quality signal: base64/minified blobs score high,
    // template/padding spam scores low — (doc, char)-keyed exchanges only.
    // Hashed columns are the EXACT integers (n_chars, n_distinct); the
    // LN-derived entropy itself is gated by the tolerance sibling below —
    // hashing it directly lost a round to a libm rounding-boundary tie.
    "q_text_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_chars"), col("n_distinct"))
        .orderBy(col("doc_id"))),


    // In-engine float gate for the entropy value: range, rounding-drift
    // and nullness violations only; oracle = empty relation.
    "q_text_entropy_verify" -> ((s, dir) =>
      TextAnalysis.charEntropyViolations(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),


    // Fingerprint: the harness row oracles the ANSI-expressible half (the
    // canonical normalized form); the engine-specific xxhash64 of it is
    // determinism/stability-checked in OperatorsSpec.
    "q_text_fingerprint" -> ((s, dir) =>
      spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          TextAnalysis.fingerprintNormalized(col("text")).as("fp_norm"),
          length(TextAnalysis.fingerprintNormalized(col("text"))).cast("long").as("fp_len"))
        .orderBy(col("doc_id"))),


    "q_text_chunks" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(spread(t(s, dir, "documents")), "doc_id", "text",
        chunkChars = 200, overlap = 50)
        .orderBy(col("doc_id"), col("chunk_id"))),


    // Unicode canonicalization over a combining-mark fixture (the ASCII
    // corpus is decorated with precomposed/decomposed/case variants of
    // the same words): NFC + case-fold + accent-strip. The hash gate
    // pins JDK java.text.Normalizer against DuckDB's utf8proc
    // (nfc_normalize / lower / strip_accents) — both implement the same
    // Unicode tables, and this is what holds them to it.
    "q_text_normalize" -> ((s, dir) => {
      val variants = array(
        lit("\u00c9cole"), lit("E\u0301cole"), // precomposed vs decomposed E-acute
        lit("no\u0308el"), lit("n\u00f6el"), // decomposed vs precomposed o-diaeresis
        lit("\u00dfTRASSE"), lit("Cafe\u0301"), lit("CAF\u00c9"),
        lit("ascii only"))
      val raw = concat(
        element_at(variants, (pmod(col("doc_id"), lit(8)) + 1).cast("int")),
        lit(" "), substring(col("text"), 1, 8))
      spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          TextAnalysis.normalizeUnicode(raw).as("nfc"),
          TextAnalysis.normalizeUnicode(raw, lower = true, stripMarks = true)
            .as("folded"),
          length(TextAnalysis.normalizeUnicode(raw)).cast("long")
            .as("nfc_chars"))
        .orderBy(col("doc_id"))
    }),


    // Composite quality gate with explainable per-rule reasons — the
    // keep/drop decision of a corpus-cleaning pipeline, fully oracled
    // (every rule is fixed-order double math over oracled stats).
    "q_quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("keep"), col("reasons"))
        .orderBy(col("doc_id"))),


    // The Gopher STRUCTURAL gates fired on purpose: docs re-lined 6
    // words per line, then one pathology per doc_id%5 slot — bullet
    // chrome ("- " on every line), teaser ellipses ("..." on every line
    // end, which also drives the '#'/'...'-per-word symbol ratio over
    // threshold), hash stuffing (" #" per line), and a machine-repeated
    // phrase whose deflate ratio (~0.04) trips the compression gate the
    // token stats alone would see as merely repetitive. The oracle
    // replays every SQL-expressible rule over the SAME reconstructed
    // text; `compressible` is the planted doc_id%5=4 slot by
    // construction (natural-text floor 0.38 vs threshold 0.25 vs
    // planted 0.04 — the exact-regime pin of the q_quality_filter
    // note, here with the rule actually firing).
    "q_quality_filter_gopher" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val ng = ((size(words) + lit(5)) / lit(6)).cast("int")
      val linesArr = transform(sequence(lit(0), ng - 1), g =>
        array_join(slice(words, g * 6 + 1, lit(6)), " "))
      val m = pmod(col("doc_id"), lit(5))
      val constructed = docs.select(col("doc_id"),
        when(m === 1,
            array_join(transform(linesArr, l => concat(lit("- "), l)), "\n"))
          .when(m === 2,
            array_join(transform(linesArr, l => concat(l, lit("..."))), "\n"))
          .when(m === 3,
            array_join(transform(linesArr, l => concat(l, lit(" #"))), "\n"))
          .when(m === 4, repeat(lit("lorem ipsum "), 40))
          .otherwise(array_join(linesArr, "\n")).as("text"))
      TextAnalysis.qualityFilter(constructed, "doc_id", "text")
        .select(col("doc_id"), col("keep"), col("reasons"))
        .orderBy(col("doc_id"))
    }),


    // Okapi BM25 retrieval over the corpus for a literal query-term set
    // (two common, one mid, one rare term → idf spread). Rounded-idf +
    // rounded-contribution decimal sums per the TfIdf determinism idiom;
    // top-20 by (score desc, doc_id) total order.
    "q_text_bm25" -> ((s, dir) =>
      operators.Bm25.score(t(s, dir, "documents"), "doc_id", "text",
        Seq("join", "stream", "vector", "dup"))),


    // TF-IDF top-3 distinctive terms per document; ranking on the ROUNDED
    // score (term tie-break) so it never hinges on sub-ulp log() deltas.
    "q_tfidf_topterms" -> ((s, dir) =>
      operators.TfIdf.topTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank"))),


    // PII redaction over deterministic synthetic PII (the fixture corpus
    // has no punctuation, so raw-documents redaction would be vacuous); the
    // oracle rebuilds the same PII text and redaction chain in SQL.
    "q_pii_redact" -> ((s, dir) => {
      val withPii = operators.PiiRedact.withSyntheticPii(
        spread(t(s, dir, "documents")), "doc_id", "text")
      operators.PiiRedact.redact(withPii, "pii_text")
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
          col("redacted"))
        .orderBy(col("doc_id"))
    }),


    // Fuzzy match: Levenshtein distance between neighboring docs' prefixes
    // — integer-exact in every engine, the classic fuzzy-dedup primitive.
    "q_text_levenshtein" -> ((s, dir) => {
      val d = spread(t(s, dir, "documents")).select(col("doc_id"),
        substring(col("text"), 1, 30).as("p"))
      d.select(col("doc_id"), col("p"))
        .join(d.select((col("doc_id") - 1).as("doc_id"), col("p").as("p2")),
          "doc_id")
        .select(col("doc_id"), levenshtein(col("p"), col("p2")).cast("long").as("dist"))
        .orderBy(col("doc_id"))
    }),


    // Repetition quality filter: fraction of tokens covered by the most
    // frequent word bigram (Gopher-style boilerplate signal).
    "q_text_repetition" -> ((s, dir) =>
      TextAnalysis.topBigramFraction(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          round(col("top_bigram_frac"), 6).as("top_bigram_frac"))
        .orderBy(col("doc_id"))),

  )

  def oracles: Map[String, String] = Map(

    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(CASE WHEN trim(text) = '' OR text IS NULL THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_bpeish,
        |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(len(regexp_extract_all(text, '(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|from|that|this)\b')) AS BIGINT) AS n_stopwords,
        |  CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
        |       THEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+'))
        |       ELSE 0.0 END AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,



    // Every numeric literal is anchored to DOUBLE: bare decimals are
    // DECIMAL-typed in DuckDB and would silently switch the arithmetic
    // from the IEEE doubles the Spark side computes to exact decimal
    // division. 0.25 = (1 - b), both exact dyadics.
    "q_text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '')) AS term
        |  FROM documents),
        |dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT count(*) FROM toks) AS sumdl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('join', 'stream', 'vector', 'dup')
        |  GROUP BY doc_id, term),
        |idf AS (
        |  SELECT term, ROUND(ln((CAST(s.n AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1), 6) AS idf
        |  FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), stats s),
        |contrib AS (
        |  SELECT t.doc_id,
        |    CAST(ROUND(i.idf * (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)) /
        |      (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |        (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE) / (CAST(s.sumdl AS DOUBLE) / s.n))), 6)
        |      AS DECIMAL(18,6)) AS c
        |  FROM tf t JOIN idf i USING (term) JOIN dls d USING (doc_id), stats s)
        |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score
        |FROM contrib GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,


    // language-ID: the expression fold (replace when strictly greater over
    // langs in order de,en,es,fr,zh) is exactly argmax-ties-to-earliest,
    // which this CASE chain reproduces. The fused TextProfile expression
    // reproduces Java's Unicode-aware \b exactly; on the fixtures the CJK
    // markers never sit at Java word boundaries, and RE2's ASCII \b in
    // DuckDB likewise scores them 0, so the engines agree here.
    "q_text_langid" ->
      """SELECT doc_id, CASE
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |  WHEN s_fr >= s_zh THEN 'fr'
        |  ELSE 'zh' END AS lang_pred
        |FROM (SELECT doc_id,
        |  len(regexp_extract_all(text, '(?i)\b(der|die|das|und|ist)\b')) AS s_de,
        |  len(regexp_extract_all(text, '(?i)\b(the|and|of|to|is)\b')) AS s_en,
        |  len(regexp_extract_all(text, '(?i)\b(el|la|los|que|es)\b')) AS s_es,
        |  len(regexp_extract_all(text, '(?i)\b(le|la|les|et|est)\b')) AS s_fr,
        |  len(regexp_extract_all(text, '(?i)\b(的|是|了|在|我)\b')) AS s_zh
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,


    // extraction oracle: generation∘extraction is the identity on the
    // content blocks, so the expected text is recomputed from the raw
    // column (the corpus is single-spaced with no markup chars — probed
    // at every SF — so whitespace normalization is also the identity).
    "q_text_extract" -> textExtractOracleSql,


    // block oracle: the template's 7-block anatomy reconstructed per doc;
    // constant blocks carry hand-counted non-ws/link chars (nav 16/16,
    // ad div 10/10, footer 28/12 — &#169; decodes to one char), text
    // blocks derive counts from the single-spaced source column.
    "q_text_extract_blocks" ->
      """WITH d AS (SELECT doc_id, text,
        |  length(replace(text, ' ', '')) AS t_nw,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS t_words
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS idx, 'title' AS tag,
        |    'Doc ' || doc_id AS text,
        |    CAST(3 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS n_chars,
        |    CAST(0 AS BIGINT) AS n_link_chars, CAST(2 AS BIGINT) AS n_words,
        |    'boilerplate' AS label FROM d
        |  UNION ALL SELECT doc_id, 1, 'nav', 'Home About Contact', 16, 16, 3,
        |    'boilerplate' FROM d
        |  UNION ALL SELECT doc_id, 2, 'h1',
        |    'Corpus document from the synthetic crawl corpus', 41, 0, 7,
        |    'content' FROM d
        |  UNION ALL SELECT doc_id, 3, 'p', text, t_nw, 0, t_words,
        |    'content' FROM d
        |  UNION ALL SELECT doc_id, 4, 'div', 'Buy now Sale', 10, 10, 3,
        |    'boilerplate' FROM d
        |  UNION ALL SELECT doc_id, 5, 'blockquote', upper(text), t_nw, 0,
        |    t_words, 'content' FROM d
        |  UNION ALL SELECT doc_id, 6, 'footer',
        |    'Terms Privacy ' || chr(169) || ' 2026 Example Corp', 28, 12, 6,
        |    'boilerplate' FROM d
        |) ORDER BY doc_id, idx""".stripMargin,


    "q_text_fix_mojibake" -> mojibakeOracleSql,


    // code-fence oracle: both blocks rebuilt from word slices (DuckDB
    // 1-based inclusive list slicing mirrors Spark's slice(start,len)).
    "q_text_code_fences" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS lst
        |  FROM documents)
        |SELECT doc_id, CAST(idx AS BIGINT) AS idx, lang, code
        |FROM (
        |  SELECT doc_id, 0 AS idx, 'python' AS lang,
        |    array_to_string(lst[5:8], ' ') AS code FROM w
        |  UNION ALL
        |  SELECT doc_id, 1, '', array_to_string(lst[9:12], ' ') FROM w)
        |ORDER BY doc_id, idx""".stripMargin,


    "q_lang_clusters" ->
      """WITH d AS (
        |  SELECT doc_id, source, doc_id % 25 AS slot,
        |    doc_id % 2 = 0 AS has_fr
        |  FROM documents)
        |SELECT 'https://www.' || source || '.example.com/en/' ||
        |    CAST(slot AS VARCHAR) AS cluster,
        |  CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(2 + max(CASE WHEN has_fr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_langs
        |FROM d GROUP BY source, slot ORDER BY cluster""".stripMargin,


    // pipeline oracle: extracted = h1const \n text \n upper(text) ⇒
    // tokens = 7 + 2·words(text); dedup groups by the extracted text
    // (equivalently by text) keeping the min-doc_id row's lang.
    "q_text_extract_pipeline" ->
      """WITH ext AS (
        |  SELECT doc_id, lang,
        |    'Corpus document from the synthetic crawl corpus' || chr(10) ||
        |      text || chr(10) || upper(text) AS ex,
        |    7 + 2 * (length(text) - length(replace(text, ' ', '')) + 1) AS n_tok
        |  FROM documents),
        |ded AS (
        |  SELECT ex, arg_min(lang, doc_id) AS lang, arg_min(n_tok, doc_id) AS n_tok
        |  FROM ext GROUP BY ex)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok
        |FROM ded WHERE n_tok >= 32
        |GROUP BY lang ORDER BY lang""".stripMargin,


    // sentence oracle: every constructed sentence rebuilt — cap rule,
    // Dr. trap, the '..'-beats-%3 terminator ladder, and the by-
    // construction abbreviation dodge (a group whose last word's
    // trailing letter run is a guard-listed abbreviation takes '!'
    // where the rotation would give '.') — so a segmenter that splits
    // at the trap or misses a boundary breaks the hash.
    "q_text_sentences" ->
      """WITH w AS (
        |  SELECT doc_id, i - 1 AS wi,
        |    CASE WHEN (i - 1) % 6 = 0
        |      THEN upper(substr(lst[i], 1, 1)) || substr(lst[i], 2)
        |      ELSE lst[i] END AS w
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS lst
        |        FROM documents),
        |       LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) r)
        |SELECT doc_id, CAST(wi // 6 AS BIGINT) AS sidx,
        |  CASE WHEN (wi // 6) % 4 = 0 THEN 'Dr. ' ELSE '' END ||
        |  string_agg(w, ' ' ORDER BY wi) ||
        |  CASE WHEN (wi // 6) % 5 = 0 THEN '..'
        |       WHEN (doc_id + wi // 6) % 3 = 0
        |            AND lower(regexp_extract(arg_max(w, wi), '([A-Za-z]+)$', 1))
        |                IN ('dr','mr','mrs','ms','prof','sr','jr','st','no',
        |                    'vs','etc','eg','ie','fig','al') THEN '!'
        |       WHEN (doc_id + wi // 6) % 3 = 0 THEN '.'
        |       WHEN (doc_id + wi // 6) % 3 = 1 THEN '!'
        |       ELSE '?' END AS sentence
        |FROM w GROUP BY doc_id, wi // 6
        |ORDER BY doc_id, sidx""".stripMargin,


    // range(stop exclusive) generates exactly the starts < max(len-50, 1)
    "q_text_chunks" ->
      """SELECT doc_id, st // 150 AS chunk_id, substring(text, CAST(st AS INT) + 1, 200) AS chunk
        |FROM (SELECT doc_id, text, unnest(range(0, greatest(length(text) - 50, 1), 150)) AS st FROM documents)
        |ORDER BY doc_id, chunk_id""".stripMargin,


    "q_text_unigram_lp" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |    UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS t(term)
        |  WHERE t.term <> ''),
        |tc AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
        |tot AS (SELECT SUM(c) AS n_total FROM tc),
        |probs AS (
        |  SELECT term,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM tc, tot),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS n_tok, SUM(lp) AS slp
        |  FROM toks JOIN probs USING (term) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(pd.n_tok, 0) AS n_tok,
        |  CAST(pd.slp AS DOUBLE) / CAST(pd.n_tok AS DOUBLE) AS avg_lp
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,


    // Bigram twin of the unigram LM oracle: conditional probs from the
    // bigram table and its head-marginal; same 6dp-round-then-decimal-sum
    // determinism contract. split_part is unambiguous: tokens are
    // whitespace-split, so the first space in "w1 w2" separates the head.
    "q_text_bigram_lp" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i + 1) AS bigram
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |c2 AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
        |c1 AS (SELECT split_part(bigram, ' ', 1) AS h, SUM(c) AS hc FROM c2 GROUP BY 1),
        |probs AS (
        |  SELECT bigram,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / CAST(hc AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM c2 JOIN c1 ON split_part(bigram, ' ', 1) = h),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp) AS slp
        |  FROM bg JOIN probs USING (bigram) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(pd.n_bigrams, 0) AS n_bigrams,
        |  CAST(pd.slp AS DOUBLE) / CAST(pd.n_bigrams AS DOUBLE) AS avg_lp2
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,


    // 3-gram diversity: same trigram derivation as the LM chain, counted
    // distinct-vs-total per doc; the ppm ratio is BIGINT floor division
    // (positive operands, truncate ≡ floor).
    "q_text_diversity" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i + 1)
        |         || ' ' || list_extract(tk, i + 2) AS gram
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk) - 1)) AS i) r
        |  WHERE len(tk) >= 3),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS total_ngrams,
        |    COUNT(DISTINCT gram) AS distinct_ngrams
        |  FROM tg GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(pd.total_ngrams, 0) AS BIGINT) AS total_ngrams,
        |  CAST(COALESCE(pd.distinct_ngrams, 0) AS BIGINT) AS distinct_ngrams,
        |  CAST((pd.distinct_ngrams * 1000000) // pd.total_ngrams AS BIGINT) AS distinct_ppm
        |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,


    // Perplexity terciles: the trigram-LM chain as a CTE, exact
    // quantile_cont thresholds (the q_agg_percentiles interpolation
    // identity), and a plain CASE — unscored docs cut out of the
    // threshold population on both engines.
    "q_text_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id, list_extract(tk, i) AS w1, list_extract(tk, i + 1) AS w2,
        |         list_extract(tk, i + 2) AS w3
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk) - 1)) AS i) r
        |  WHERE len(tk) >= 3),
        |bg AS (
        |  SELECT list_extract(tk, i) AS a, list_extract(tk, i + 1) AS b
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |un AS (SELECT t.term FROM toks, UNNEST(tk) AS t(term)),
        |c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tg GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12 FROM c3 GROUP BY 1, 2),
        |c2 AS (SELECT a, b, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1h AS (SELECT a, CAST(SUM(c2) AS BIGINT) AS c1h FROM c2 GROUP BY 1),
        |c1 AS (SELECT term, COUNT(*) AS c FROM un GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c1),
        |lp AS (
        |  SELECT tg.doc_id,
        |    CAST(ROUND(LN((70 * (CAST(c3.c3 AS DOUBLE) / CAST(c12.c12 AS DOUBLE))
        |                 + 20 * (CAST(c2.c2 AS DOUBLE) / CAST(c1h.c1h AS DOUBLE))
        |                 + 10 * (CAST(c1.c AS DOUBLE) / CAST(n.n AS DOUBLE))) / 100), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM tg
        |  JOIN c3 USING (w1, w2, w3)
        |  JOIN c12 USING (w1, w2)
        |  JOIN c2 ON c2.a = tg.w2 AND c2.b = tg.w3
        |  JOIN c1h ON c1h.a = tg.w2
        |  JOIN c1 ON c1.term = tg.w3
        |  CROSS JOIN n),
        |pd AS (SELECT doc_id, COUNT(*) AS n_trigrams, SUM(lp) AS slp
        |       FROM lp GROUP BY 1),
        |scored AS (
        |  SELECT d.doc_id, COALESCE(pd.n_trigrams, 0) AS n_trigrams,
        |    CAST(pd.slp AS DOUBLE) / CAST(pd.n_trigrams AS DOUBLE) AS avg_lp3
        |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id),
        |thr AS (
        |  SELECT quantile_cont(avg_lp3, 1.0/3) AS t1,
        |         quantile_cont(avg_lp3, 2.0/3) AS t2
        |  FROM scored WHERE n_trigrams > 0)
        |SELECT doc_id, n_trigrams, avg_lp3,
        |  CASE WHEN n_trigrams = 0 THEN 'unscored'
        |       WHEN avg_lp3 >= t2 THEN 'head'
        |       WHEN avg_lp3 >= t1 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM scored CROSS JOIN thr
        |ORDER BY doc_id""".stripMargin,


    // Interpolated trigram LM: every conditional is a single DOUBLE
    // division of BIGINT counts, the λ-weighted sum is the identical
    // left-associative chain on both engines, and only the final LN
    // leans on the 6dp-round + decimal-sum contract.
    "q_text_trigram_lp" -> trigramLpSql,


    // The reloaded-model twin shares the oracle VERBATIM: persistence
    // must be invisible to the scores.
    "q_text_trigram_reload" -> trigramLpSql,


    // Class keywords: the same (cls, term) counts and smoothed odds ratio
    // in BIGINT floor division; per-class cut via QUALIFY under the
    // identical total order.
    "q_text_keywords" ->
      """WITH toks AS (
        |  SELECT CAST(lang AS VARCHAR) AS cls, t.term
        |  FROM documents,
        |    UNNEST(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                       x -> x <> '')) AS t(term)),
        |a AS (SELECT cls, term, COUNT(*) AS a FROM toks GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(SUM(a) AS BIGINT) AS ct FROM a GROUP BY 1),
        |nc AS (SELECT cls, CAST(SUM(a) AS BIGINT) AS nc FROM a GROUP BY 1),
        |n AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM a),
        |scored AS (
        |  SELECT a.cls, a.term, a.a,
        |    CAST(((CAST(a.a AS HUGEINT) + 1)
        |           * (n.n - nc.nc - (ct.ct - a.a) + 1) * 1000000)
        |      // ((CAST(ct.ct AS HUGEINT) - a.a + 1)
        |           * (nc.nc - a.a + 1)) AS BIGINT) AS odds_ppm
        |  FROM a JOIN ct ON ct.term = a.term JOIN nc ON nc.cls = a.cls
        |  CROSS JOIN n
        |  WHERE a.a >= 5)
        |SELECT cls, term, a, odds_ppm FROM scored
        |QUALIFY row_number() OVER (PARTITION BY cls
        |  ORDER BY odds_ppm DESC, a DESC, term ASC) <= 20
        |ORDER BY cls, odds_ppm DESC, a DESC, term""".stripMargin,


    // PMI collocations: same bigram derivation as q_text_bigram_lp kept
    // as (w1, w2) columns; marginals CAST to BIGINT (SUM widens to
    // HUGEINT otherwise); the ppm ratio multiplies in HUGEINT (Spark
    // side: DECIMAL(38,0)) so neither engine can wrap/abort at large
    // corpus counts, then floor-divides back to BIGINT — positive
    // operands, so truncate ≡ floor.
    "q_text_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT list_extract(tk, i) AS w1, list_extract(tk, i + 1) AS w2
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |n2 AS (SELECT CAST(SUM(c12) AS BIGINT) AS n2 FROM c12),
        |heads AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1h FROM c12 GROUP BY 1),
        |tails AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2t FROM c12 GROUP BY 1)
        |SELECT c.w1, c.w2, c.c12,
        |  CAST((CAST(c.c12 AS HUGEINT) * 1000000 * n2.n2)
        |       // (CAST(h.c1h AS HUGEINT) * t.c2t) AS BIGINT) AS pmi_ppm
        |FROM c12 c
        |JOIN heads h ON h.w1 = c.w1
        |JOIN tails t ON t.w2 = c.w2
        |CROSS JOIN n2
        |WHERE c.c12 >= 5
        |ORDER BY pmi_ppm DESC, c.c12 DESC, c.w1, c.w2
        |LIMIT 100""".stripMargin,


    // Character entropy: EXACT integer pieces only — the LN-derived value
    // is carried by the tolerance gate q_text_entropy_verify instead of a
    // cross-engine float hash.
    "q_text_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, t.ch FROM documents,
        |    UNNEST(string_split(text, '')) AS t(ch)
        |  WHERE t.ch <> ''),
        |c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
        |n AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd FROM c GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(n.n, 0) AS BIGINT) AS n_chars,
        |  CAST(COALESCE(n.nd, 0) AS BIGINT) AS n_distinct
        |FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id
        |ORDER BY d.doc_id""".stripMargin,


    "q_text_entropy_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,


    // The combining-mark fixture rebuilt with chr() codepoints; DuckDB's
    // utf8proc (nfc_normalize / lower / strip_accents) must agree with
    // the JVM normalizer codepoint for codepoint. Fold order matches the
    // engine: NFC → lower → strip.
    "q_text_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN chr(201) || 'cole'
        |      WHEN 1 THEN 'E' || chr(769) || 'cole'
        |      WHEN 2 THEN 'no' || chr(776) || 'el'
        |      WHEN 3 THEN 'n' || chr(246) || 'el'
        |      WHEN 4 THEN chr(223) || 'TRASSE'
        |      WHEN 5 THEN 'Cafe' || chr(769)
        |      WHEN 6 THEN 'CAF' || chr(201)
        |      ELSE 'ascii only' END || ' ' || substr(text, 1, 8) AS r
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(r) AS nfc,
        |  strip_accents(lower(nfc_normalize(r))) AS folded,
        |  CAST(length(nfc_normalize(r)) AS BIGINT) AS nfc_chars
        |FROM raw ORDER BY doc_id""".stripMargin,


    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS fp_norm,
        |  CAST(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS BIGINT) AS fp_len
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q_tfidf_topterms" ->
      """WITH docterm AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |    FROM documents) t
        |  WHERE term <> ''),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM docterm GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    ROUND(CAST(tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, term, rank, tfidf FROM (
        |  SELECT doc_id, term, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored) z
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,


    // Quality gate: stats formulas identical to q_text_stats /
    // q_text_repetition; concat_ws skips the NULL (passing) rules in both
    // engines, so `reasons` is byte-identical. The Gopher structural
    // rules are replayed generically (symbol ratio, bullet/ellipsis line
    // fractions with the >=3-line guard); the COMPRESSIBLE rule is an
    // exact-regime pin rather than a replay (DuckDB cannot deflate):
    // every natural-text doc in the fixture corpus deflates to >= 0.38
    // of its raw bytes (measured floor across sf0.001/0.01/0.1), the
    // threshold sits at 0.25, so the rule provably never fires here —
    // omitting it from the CASE ladder asserts exactly that, and a
    // spurious engine-side fire breaks the hash.
    "q_quality_filter" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |bg AS (SELECT doc_id, len(tk) AS n_tok, list_extract(tk, i) || ' ' || list_extract(tk, i+1) AS b
        |       FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |       WHERE len(tk) >= 2),
        |m AS (SELECT doc_id, n_tok, max(c) AS maxc FROM (
        |        SELECT doc_id, n_tok, b, count(*) AS c FROM bg GROUP BY 1, 2, 3) z
        |      GROUP BY 1, 2),
        |rep AS (SELECT d.doc_id, COALESCE(2.0 * m.maxc / m.n_tok, 0.0) AS rep
        |        FROM documents d LEFT JOIN m USING (doc_id)),
        |st0 AS (SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |         ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tokens
        |  FROM documents),
        |st AS (SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / n_tokens
        |    END AS mtl,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS DOUBLE) / n_tokens
        |    END AS ttr,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(len(regexp_extract_all(text, '(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|from|that|this)\b')) AS DOUBLE) / n_tokens
        |    END AS stopr
        |  FROM st0),
        |ln AS (SELECT doc_id, string_split(text, chr(10)) AS ls,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) AS syms
        |  FROM documents),
        |lf AS (SELECT doc_id, syms,
        |    CASE WHEN len(ls) >= 3
        |      THEN CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*] '))) AS DOUBLE) / len(ls)
        |      ELSE 0.0 END AS bulletf,
        |    CASE WHEN len(ls) >= 3
        |      THEN CAST(len(list_filter(ls, l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS DOUBLE) / len(ls)
        |      ELSE 0.0 END AS ellipf
        |  FROM ln),
        |r AS (SELECT st.doc_id,
        |    concat_ws(',',
        |      CASE WHEN bulletf > 0.9 THEN 'bullet_lines' END,
        |      CASE WHEN ellipf > 0.3 THEN 'ellipsis_lines' END,
        |      CASE WHEN ttr < 0.35 THEN 'low_diversity' END,
        |      CASE WHEN stopr < 0.02 THEN 'no_stopwords' END,
        |      CASE WHEN rep > 0.125 THEN 'repetitive' END,
        |      CASE WHEN n_tokens > 0 AND syms / n_tokens > 0.1 THEN 'symbol_ratio' END,
        |      CASE WHEN mtl < 3.0 OR mtl > 8.0 THEN 'token_len' END,
        |      CASE WHEN n_tokens > 100000 THEN 'too_long' END,
        |      CASE WHEN n_tokens < 20 THEN 'too_short' END) AS reasons
        |  FROM st JOIN rep USING (doc_id) JOIN lf ON lf.doc_id = st.doc_id)
        |SELECT doc_id, reasons = '' AS keep, reasons FROM r ORDER BY doc_id""".stripMargin,


    // Gopher-gate oracle: the 6-word relining + per-slot pathology is
    // reconstructed, every SQL-expressible rule is replayed over that
    // SAME text, and `compressible` is the planted doc_id%5=4 slot (the
    // deflate pin documented at q_quality_filter — 0.04 planted vs 0.25
    // threshold vs 0.38 natural floor).
    "q_quality_filter_gopher" ->
      """WITH w AS (
        |  SELECT doc_id, i - 1 AS wi, lst[i] AS wd
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS lst
        |        FROM documents),
        |       LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) r),
        |lines0 AS (
        |  SELECT doc_id, wi // 6 AS li, string_agg(wd, ' ' ORDER BY wi) AS line
        |  FROM w GROUP BY doc_id, wi // 6),
        |relined AS (
        |  SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY li) AS t0,
        |    string_agg('- ' || line, chr(10) ORDER BY li) AS t1,
        |    string_agg(line || '...', chr(10) ORDER BY li) AS t2,
        |    string_agg(line || ' #', chr(10) ORDER BY li) AS t3
        |  FROM lines0 GROUP BY doc_id),
        |txt AS (
        |  SELECT d.doc_id,
        |    CASE d.doc_id % 5 WHEN 1 THEN t1 WHEN 2 THEN t2 WHEN 3 THEN t3
        |      WHEN 4 THEN repeat('lorem ipsum ', 40) ELSE t0 END AS text
        |  FROM documents d JOIN relined USING (doc_id)),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM txt),
        |bg AS (SELECT doc_id, len(tk) AS n_tok, list_extract(tk, i) || ' ' || list_extract(tk, i+1) AS b
        |       FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |       WHERE len(tk) >= 2),
        |m AS (SELECT doc_id, n_tok, max(c) AS maxc FROM (
        |        SELECT doc_id, n_tok, b, count(*) AS c FROM bg GROUP BY 1, 2, 3) z
        |      GROUP BY 1, 2),
        |rep AS (SELECT t.doc_id, COALESCE(2.0 * m.maxc / m.n_tok, 0.0) AS rep
        |        FROM txt t LEFT JOIN m USING (doc_id)),
        |st0 AS (SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |         ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tokens
        |  FROM txt),
        |st AS (SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / n_tokens
        |    END AS mtl,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS DOUBLE) / n_tokens
        |    END AS ttr,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(len(regexp_extract_all(text, '(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|from|that|this)\b')) AS DOUBLE) / n_tokens
        |    END AS stopr
        |  FROM st0),
        |ln AS (SELECT doc_id, string_split(text, chr(10)) AS ls,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) AS syms
        |  FROM txt),
        |lf AS (SELECT doc_id, syms,
        |    CASE WHEN len(ls) >= 3
        |      THEN CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*] '))) AS DOUBLE) / len(ls)
        |      ELSE 0.0 END AS bulletf,
        |    CASE WHEN len(ls) >= 3
        |      THEN CAST(len(list_filter(ls, l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS DOUBLE) / len(ls)
        |      ELSE 0.0 END AS ellipf
        |  FROM ln),
        |r AS (SELECT st.doc_id,
        |    concat_ws(',',
        |      CASE WHEN bulletf > 0.9 THEN 'bullet_lines' END,
        |      CASE WHEN st.doc_id % 5 = 4 THEN 'compressible' END,
        |      CASE WHEN ellipf > 0.3 THEN 'ellipsis_lines' END,
        |      CASE WHEN ttr < 0.35 THEN 'low_diversity' END,
        |      CASE WHEN stopr < 0.02 THEN 'no_stopwords' END,
        |      CASE WHEN rep > 0.125 THEN 'repetitive' END,
        |      CASE WHEN n_tokens > 0 AND syms / n_tokens > 0.1 THEN 'symbol_ratio' END,
        |      CASE WHEN mtl < 3.0 OR mtl > 8.0 THEN 'token_len' END,
        |      CASE WHEN n_tokens > 100000 THEN 'too_long' END,
        |      CASE WHEN n_tokens < 20 THEN 'too_short' END) AS reasons
        |  FROM st JOIN rep USING (doc_id) JOIN lf ON lf.doc_id = st.doc_id)
        |SELECT doc_id, reasons = '' AS keep, reasons FROM r ORDER BY doc_id""".stripMargin,


    // Rebuilds the synthetic PII text and the email→IP→phone redaction
    // chain verbatim (DuckDB regexp_replace needs the 'g' flag — its
    // default replaces only the first match, Spark replaces all).
    "q_pii_redact" ->
      """WITH pii AS (
        |  SELECT doc_id,
        |    substring(text, 1, 40)
        |      || ' user' || CAST(doc_id AS VARCHAR) || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
        |      || CASE WHEN doc_id % 3 = 0
        |              THEN ' 555-01' || CAST(doc_id % 10 AS VARCHAR) || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              ELSE '' END
        |      || CASE WHEN doc_id % 4 = 0
        |              THEN ' 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 31) % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)
        |              ELSE '' END AS pii_text
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, pii_text,
        |    regexp_replace(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
        |  FROM pii),
        |st2 AS (
        |  SELECT doc_id, pii_text, after_email,
        |    regexp_replace(after_email, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS after_ip
        |  FROM st)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(after_ip, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(after_email, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  regexp_replace(after_ip, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM st2 ORDER BY doc_id""".stripMargin,


    "q_text_levenshtein" ->
      """SELECT a.doc_id, CAST(levenshtein(substring(a.text, 1, 30), substring(b.text, 1, 30)) AS BIGINT) AS dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,


    "q_text_repetition" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |bg AS (
        |  SELECT doc_id, len(tk) AS n_tok, list_extract(tk, i) || ' ' || list_extract(tk, i+1) AS b
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |m AS (
        |  SELECT doc_id, n_tok, max(c) AS maxc FROM (
        |    SELECT doc_id, n_tok, b, count(*) AS c FROM bg GROUP BY 1, 2, 3) q
        |  GROUP BY 1, 2)
        |SELECT d.doc_id, ROUND(COALESCE(2.0 * m.maxc / m.n_tok, 0.0), 6) AS top_bigram_frac
        |FROM documents d LEFT JOIN m USING (doc_id) ORDER BY doc_id""".stripMargin,

  )
}
