package graft
package registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{EventTime, GraftFunctions}
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.StreamingIngest
import SparkEntry._

/** Quality query/oracle registry — one slice of the driver contract
  * surface, split out of the former 15k-line SparkEntry monolith so a
  * duplicated query-name literal can never silently shadow a pair out
  * of the sweep again (the round-17 q_text_chunks incident).
  * Query lambdas and oracle texts are verbatim moves; shared helpers
  * stay on [[SparkEntry]] (imported above). Composed — with a
  * cross-registry duplicate guard — in [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]]. */
private[graft] object QualityRegistry extends QueryRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TRAINED document classifier (multinomial Naive Bayes, add-one
    // smoothing): train on 4/5 of the corpus labeled by `lang`, classify
    // the held-out fifth. The model is a vocab-sized broadcast table; the
    // corpus shuffles only on (doc, ·) keys — the CCNet/LLaMA quality-
    // classifier shape as a first-class oracled operator.
    "q_classify_nb" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Classify.naiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang")
        .orderBy(col("doc_id"))
    }),


    // Persistence twin of q_classify_nb: train → save the model grid to
    // parquet → load it back → score. Shares q_classify_nb's ORACLE
    // verbatim, so the reloaded model must classify hash-identically to
    // the train-fresh one — the "train once, score forever" gate.
    "q_classify_nb_reload" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_nb_model_"))
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_nb_model_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      operators.Classify.saveModel(
        operators.Classify.trainNaiveBayes(
          docs.filter(col("doc_id") % 5 =!= 0), "text", "lang"), path)
      operators.Classify.scoreNaiveBayes(
        operators.Classify.loadModel(s, path),
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    // Privacy-governance gate: k-anonymity + l-diversity audit of the
    // customer table under the (nation, segment) quasi-identifier with
    // the account-balance thousand-bucket as the sensitive attribute.
    // Exact two-level combining aggregate — no count_distinct expand.
    "q_kanon_audit" -> ((s, dir) =>
      validate.Anonymity.kAnonymityAudit(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"),
          expr("cast(floor(c_acctbal / 1000) as bigint)"), k = 10L)
        .select(col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"), col("group_size"), col("l_distinct"),
          col("at_risk"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),


    // Generalization FIXPOINT: widen the acctbal bucket (500·2^L) until
    // every (segment, bucket) group reaches k=20 — the level sweep runs
    // over the level-0 GROUPED frame only, and the chosen level is a
    // one-row broadcast joined back. Converges at a data-dependent
    // level the oracle re-derives independently. Hash-oracled.
    "q_kanon_generalize" -> ((s, dir) =>
      validate.Anonymity.generalizeNumericToK(t(s, dir, "customer"),
          Seq("c_mktsegment"), col("c_acctbal"), baseBucket = 500L, k = 20L)
        .withColumn("gen_level", col("gen_level").cast("long"))
        .orderBy(col("c_mktsegment"), col("bucket"))),


    // The SUPPRESSION path of the same fixpoint: k=40 is unreachable
    // (the sparse negative-balance bucket never merges past ~21 rows at
    // any widening), so the search caps at maxLevels and flags the
    // residual risky groups suppressed — generalize-then-suppress.
    "q_kanon_suppress" -> ((s, dir) =>
      validate.Anonymity.generalizeNumericToK(t(s, dir, "customer"),
          Seq("c_mktsegment"), col("c_acctbal"), baseBucket = 500L, k = 40L)
        .withColumn("gen_level", col("gen_level").cast("long"))
        .orderBy(col("c_mktsegment"), col("bucket"))),


    // Declarative expectations audit (validate.Expectations) — the
    // warehouse generalization of the reference's mandatory-field
    // validator: six rules over lineitem in ONE aggregation pass plus a
    // keyed uniqueness check and a broadcast anti-join foreign-key check,
    // one (rule, n_violations, n_rows) row each. The in_set and in_range
    // rules are tuned to FIRE (tens of thousands of violations), so the
    // hash gate covers real counts, not just zeros. Fully oracled.
    "q_expectations" -> ((s, dir) => {
      import graft.validate.Expectations
      val li = t(s, dir, "lineitem")
      Expectations.audit(li,
        rules = Seq(
          Expectations.notNull("l_orderkey"),
          Expectations.inRange("l_quantity", 1L, 30L),
          Expectations.inSet("l_returnflag", Seq("A", "N")),
          Expectations.matches("l_linestatus", "^[FO]$")),
        uniqueKeys = Seq(Seq("l_orderkey", "l_linenumber")),
        foreignKeys = Seq(("l_orderkey", t(s, dir, "orders"), "o_orderkey")))
        .orderBy(col("rule"))
    }),


    // Normal-equation moments for the trainable quality regressor
    // (predict text length from token/stopword counts): the distributed
    // half of LinearModel.fit, hash-matched under the q_vec_gram
    // fixed-point contract over the augmented
    // [1, n_tokens, n_stopwords, n_chars] vector.
    "q_reg_moments" -> ((s, dir) =>
      operators.LinearModel.moments(
        regFeatures(t(s, dir, "documents")),
        Seq("f_tokens", "f_stop"), "y_chars")
        .orderBy(col("i"), col("j"))
        .select(col("i").cast("string").as("i"), col("j").cast("string").as("j"),
          col("qsum").cast("string").as("qsum"), col("n").cast("string").as("n"))),


    // Thousands of independent regressions in ONE pass: per-nation OLS of
    // order value against order year as pure BIGINT sufficient statistics
    // (six moment sums + exact rational slope + floor-division milli
    // slope). Dims broadcast; one combining shuffle on the group key; no
    // per-group solver, no driver loop. Hash-oracled end to end.
    "q_reg_per_group" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      operators.LinearModel.groupedOls(joined, "n_name",
        year(col("o_orderdate")) - lit(1995), floor(col("o_totalprice")))
        .orderBy(col("grp"))
    }),


    // The fit's verification gate: per-coefficient normal-equation
    // gradient Σ xⱼ·(y − ŷ) re-derived in-engine (fixed-point folds) must
    // stay within the quantization-derived bound — a wrong pivot, index
    // slip, or sign in the driver solve blows it by orders of magnitude.
    // Violations only; oracle = empty relation.
    "q_reg_verify" -> ((s, dir) => {
      import s.implicits._
      val d = regFeatures(t(s, dir, "documents")).localCheckpoint()
      val feats = Seq("f_tokens", "f_stop")
      val fit = operators.LinearModel.fit(d, feats, "y_chars")
      // bound + the gradient computation's own quantization (n/grid),
      // then 4x safety — see LinearModel scaladoc for the derivation
      val tol = 4.0 * (fit.gradientBound + fit.n / fit.grid)
      val gradVio = operators.LinearModel.gradientSums(d, feats, "y_chars", fit)
        .filter(abs(col("qgrad").cast("double") / fit.grid) > tol ||
          col("n") =!= fit.n)
        .select(col("j"),
          when(col("n") =!= fit.n, lit("row_count_mismatch"))
            .otherwise(lit("gradient_out_of_bound")).as("issue"),
          (col("qgrad").cast("double") / fit.grid).as("value"))
      val badW = fit.weights.zipWithIndex
        .filter { case (w, _) => w.isNaN || w.isInfinite }
        .map { case (w, j) => (j.toLong, "weight_not_finite", w) }
      gradVio.unionByName(badW.toSeq.toDF("j", "issue", "value"))
        .orderBy(col("j"))
    }),


    // PSI distribution drift between the view and purchase value
    // distributions, fixed literal bin bounds (frozen-reference
    // discipline: bounds must not float with the monitored data).
    "q_drift_psi" -> ((s, dir) =>
      operators.Profiler.driftPsi(t(s, dir, "events"), "event_type",
        "view", "purchase", "value", Seq(10, 20, 40, 80, 160))
        .orderBy(col("bin"))),


    // Median/MAD robust outliers over the skewed event values — the
    // distribution-robust data-quality gate (mean/stddev thresholds are
    // dragged by the tail they should flag). Exact-percentile med/mad,
    // flagged rows only.
    "q_outliers_mad" -> ((s, dir) =>
      operators.Profiler.robustOutliers(t(s, dir, "events"), "event_id", "value")
        .orderBy(col("event_id"))),


    // Single-pass table profile: per-column null/distinct/min/max from
    // ONE scan (the pre-training data-quality gate); exact distincts are
    // the oracle contract, approx_count_distinct the 100 TB path (spec'd).
    "q_profile_table" -> ((s, dir) =>
      operators.Profiler.profile(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("col_name"))),

  )

  def oracles: Map[String, String] = Map(

    // One UNION ALL branch per rule, each re-deriving the count the
    // engine's fused single-pass aggregation produces; NULL rule results
    // count as violations on both sides.
    "q_expectations" ->
      """SELECT * FROM (
        |  SELECT 'not_null:l_orderkey' AS rule,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_violations,
        |    COUNT(*) AS n_rows
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_quantity',
        |    CAST(SUM(CASE WHEN NOT COALESCE(
        |      l_quantity >= 1 AND l_quantity <= 30, FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_set:l_returnflag',
        |    CAST(SUM(CASE WHEN NOT COALESCE(
        |      l_returnflag IN ('A', 'N'), FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'matches:l_linestatus',
        |    CAST(SUM(CASE WHEN NOT COALESCE(
        |      regexp_matches(l_linestatus, '^[FO]$'), FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique:l_orderkey,l_linenumber',
        |    CAST(COALESCE(SUM(c - 1), 0) AS BIGINT),
        |    CAST(COALESCE(SUM(c), 0) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber)
        |  UNION ALL
        |  SELECT 'fk:l_orderkey->o_orderkey',
        |    (SELECT COUNT(*) FROM lineitem l
        |     WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |    (SELECT COUNT(*) FROM lineitem))
        |ORDER BY rule""".stripMargin,


    // Multinomial NB: train on doc_id%5<>0 labeled by lang, classify the
    // held-out fifth. Same 6dp-round-then-decimal-sum contract; the
    // completed term×label grid gives unseen-for-label tokens the
    // Laplace-smoothed mass; argmax tie-breaks on label.
    "q_classify_nb" -> nbOracleSql,


    // The reloaded-model twin shares the oracle VERBATIM: the parquet
    // round-trip of the decimal grid must be invisible to every score.
    "q_classify_nb_reload" -> nbOracleSql,


    // k-anonymity / l-diversity: two-level exact aggregate; the NULL
    // bucket (if any) counts as a sensitive value, matching the engine.
    "q_kanon_audit" ->
      """WITH lv AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sv, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(SUM(n) AS BIGINT) AS group_size,
        |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
        |  (SUM(n) < 10 OR COUNT(*) < 2) AS at_risk
        |FROM lv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Fixpoint replay: level-0 buckets once, halve per level by explicit
    // FLOOR (DuckDB's // truncates toward zero — measured — so it can't
    // stand in for the engine's arithmetic-shift floor on negatives),
    // pick the first level whose min group size reaches k.
    "q_kanon_generalize" -> kanonGeneralizeSql(20),


    "q_kanon_suppress" -> kanonGeneralizeSql(40),


    "q_drift_psi" ->
      """WITH s AS (
        |  SELECT CASE WHEN CAST(value AS DOUBLE) <= 10 THEN 0
        |              WHEN CAST(value AS DOUBLE) <= 20 THEN 1
        |              WHEN CAST(value AS DOUBLE) <= 40 THEN 2
        |              WHEN CAST(value AS DOUBLE) <= 80 THEN 3
        |              WHEN CAST(value AS DOUBLE) <= 160 THEN 4
        |              ELSE 5 END AS bin, event_type
        |  FROM events
        |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
        |c AS (
        |  SELECT bin,
        |    count(*) FILTER (WHERE event_type = 'view') AS n_ref,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS n_cur
        |  FROM s GROUP BY bin),
        |t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM c)
        |SELECT CAST(bin AS BIGINT) AS bin, n_ref, n_cur,
        |  ROUND(CAST(n_ref AS DOUBLE) / tr, 6) AS p_ref,
        |  ROUND(CAST(n_cur AS DOUBLE) / tc, 6) AS p_cur,
        |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
        |    ROUND((CAST(n_cur AS DOUBLE) / tc - CAST(n_ref AS DOUBLE) / tr)
        |          * ln((CAST(n_cur AS DOUBLE) / tc) / (CAST(n_ref AS DOUBLE) / tr)), 6)
        |  END AS psi_term
        |FROM c, t ORDER BY bin""".stripMargin,


    "q_outliers_mad" ->
      """WITH m AS (SELECT quantile_cont(CAST(value AS DOUBLE), 0.5) AS med FROM events),
        |d AS (SELECT med, quantile_cont(abs(CAST(value AS DOUBLE) - med), 0.5) AS mad
        |      FROM events, m GROUP BY med)
        |SELECT event_id, CAST(value AS DOUBLE) AS value,
        |  ROUND(CAST(value AS DOUBLE) - med, 6) AS deviation,
        |  CAST(value AS DOUBLE) > med AS is_high
        |FROM events, d
        |WHERE abs(CAST(value AS DOUBLE) - med) > CAST(3.5 AS DOUBLE) * mad
        |ORDER BY event_id""".stripMargin,


    // One SELECT per profiled column, UNION ALL — the oracle mirror of
    // the one-pass profile (DuckDB reads the view once per branch; the
    // Spark side's single-scan shape is what the plan spec guards).
    "q_profile_table" ->
      """SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
        |  COUNT(*) FILTER (WHERE doc_id IS NULL) AS n_nulls,
        |  COUNT(DISTINCT doc_id) AS n_distinct,
        |  CAST(MIN(doc_id) AS VARCHAR) AS min_value, CAST(MAX(doc_id) AS VARCHAR) AS max_value
        |FROM documents
        |UNION ALL
        |SELECT 'lang', COUNT(*), COUNT(*) FILTER (WHERE lang IS NULL),
        |  COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'source', COUNT(*), COUNT(*) FILTER (WHERE source IS NULL),
        |  COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', COUNT(*), COUNT(*) FILTER (WHERE n_chars IS NULL),
        |  COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
        |FROM documents
        |ORDER BY col_name""".stripMargin,


    // Feature expressions are the q_text_stats oracle formulas verbatim;
    // the triangle math mirrors q_vec_gram over the 4-slot augmented
    // vector [1, f_tokens, f_stop, y_chars].
    "q_reg_moments" ->
      """WITH f AS (
        |  SELECT
        |    CAST(CASE WHEN trim(text) = '' OR text IS NULL THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS ft,
        |    CAST(len(regexp_extract_all(text, '(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|from|that|this)\b')) AS DOUBLE) AS fs,
        |    CAST(length(text) AS DOUBLE) AS y
        |  FROM documents WHERE text IS NOT NULL),
        |v AS (SELECT [CAST(1 AS DOUBLE), ft, fs, y] AS fv FROM f)
        |SELECT CAST(i.i AS VARCHAR) AS i, CAST(j.j AS VARCHAR) AS j,
        |  CAST(SUM(CAST(FLOOR(fv[i.i + 1] * fv[j.j + 1] * 1000000) AS BIGINT)) AS VARCHAR) AS qsum,
        |  CAST(COUNT(*) AS VARCHAR) AS n
        |FROM v, (SELECT UNNEST(RANGE(0, 4)) AS i) i, (SELECT UNNEST(RANGE(0, 4)) AS j) j
        |WHERE j.j >= i.i
        |GROUP BY i.i, j.j
        |ORDER BY i.i, j.j""".stripMargin,


    "q_reg_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS j, CAST(NULL AS VARCHAR) AS issue,
        |  CAST(NULL AS DOUBLE) AS value
        |WHERE FALSE""".stripMargin,


    // Same integer sufficient-statistics derivation; `//` truncates toward
    // zero exactly like the engine's `div` (measured on negative
    // quotients), and every SUM is CAST back to BIGINT.
    "q_reg_per_group" ->
      """WITH base AS (
        |  SELECT CAST(n.n_name AS VARCHAR) AS grp,
        |    CAST(year(o.o_orderdate) - 1995 AS BIGINT) AS x,
        |    CAST(FLOOR(o.o_totalprice) AS BIGINT) AS y
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE o.o_orderdate IS NOT NULL AND o.o_totalprice IS NOT NULL),
        |m AS (
        |  SELECT grp, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy, CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM base GROUP BY grp)
        |SELECT grp, n, sx, sy, sxx, syy, sxy,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        |  CASE WHEN n * sxx - sx * sx <> 0
        |    THEN CAST((1000 * (n * sxy - sx * sy))
        |      // (n * sxx - sx * sx) AS BIGINT)
        |    ELSE NULL END AS slope_milli
        |FROM m ORDER BY grp""".stripMargin,

  )
}
