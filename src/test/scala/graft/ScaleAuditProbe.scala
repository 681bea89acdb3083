package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic main (test scope — not shipped): the round-11
  * directive-#5 scale-growth audit. Synthesizes a 5× corpus ("sf0.5")
  * from sf0.1 by REPLICA SHIFTING — ids shifted by r·10⁷ (≡ 0 mod every
  * fixture modulus, so per-replica distributions are identical), document
  * tokens suffixed per replica and embedding components deterministically
  * perturbed (so near-dup/cosine structure stays PROPORTIONAL instead of
  * exploding quadratically across replicas — the audit measures the
  * ALGORITHM's growth, not an artifact of 5× duplicate multiplicity) —
  * then runs the heavy query families at both scales under a stage-level
  * shuffle tally and prints s, rows, shuffle MB, and the 5×-normalized
  * growth ratio per query.
  *
  * Replica scaling preserves the degree distribution of the lineitem
  * co-purchase graph (5 disjoint copies), so the triangle family is
  * EXPECTED to grow ~5× here; organic growth with overlapping keys
  * densifies the graph and superlinearizes (wedge count ∝ Σd²) — that
  * regime is what the DOULION estimator exists for.
  */
object ScaleAuditProbe {

  private class Tally extends org.apache.spark.scheduler.SparkListener {
    private val byStage =
      new java.util.concurrent.ConcurrentHashMap[Int, (Boolean, Long, Long)]
    override def onStageCompleted(
        ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = ev.stageInfo.taskMetrics
      if (m != null) {
        val v = (ev.stageInfo.failureReason.isEmpty,
          m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead)
        byStage.merge(ev.stageInfo.stageId, v,
          (old, nw) => if (nw._1 || !old._1) nw else old)
        ()
      }
    }
    def snapshot: (Long, Long) = {
      var w = 0L; var r = 0L
      byStage.values.forEach { case (_, wb, rb) => w += wb; r += rb }
      (w, r)
    }
  }

  private val Shift = 10000000L

  private def replicate(df: DataFrame, r: Int)(shift: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until r).map(i => shift(df, i)).reduce(_.unionByName(_))

  def buildScaled(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    replicate(docs, reps) { (d, i) =>
      val txt =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1x$i")
      d.select((col("doc_id") + i * Shift).as("doc_id"), txt.as("text"),
        col("lang"), col("source"), length(txt).cast("long").as("n_chars"))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")

    // Per-replica coordinate ROTATION (v'[j] = v[(j + 17·i) mod d]) — an
    // isometry, so every within-replica cosine is EXACTLY the original
    // geometry, while cross-replica inner products decorrelate (additive
    // noise kept cross-replica cosine ≈ 1 and quadratically densified the
    // near-dup graph — an artifact, not algorithm growth; measured 19×/5
    // before this fix).
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    replicate(emb, reps) { (d, i) =>
      val v =
        if (i == 0) col("embedding")
        else transform(col("embedding"), (_, j) =>
          element_at(col("embedding"),
            (pmod(j + lit(17 * i), size(col("embedding")))) + 1))
      d.select((col("vec_id") + i * Shift).as("vec_id"), v.as("embedding"),
        col("label"))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    replicate(li, reps) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + i * 1000000000L)
        .withColumn("l_partkey", col("l_partkey") + i * 1000000000L)
        .withColumn("l_suppkey", col("l_suppkey") + i * 1000000000L)
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
  }

  private val AuditQueries = Seq(
    "q_dedup_exact", "q_dedup_ngram", "q_dedup_minhash", "q_dedup_substring",
    "q_dedup_semantic", "q_sim_topk_ivf", "q_bpe_tokenize", "q_pack_sequences",
    "q_corpus_pipeline_v2", "q_train_pipeline", "q_triangles", "q_pagerank")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = s"${System.getProperty("java.io.tmpdir")}/graft_sf05"
    val reps = 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)

    if (!new java.io.File(s"$dst/lineitem.parquet").exists() ||
        args.contains("rebuild")) {
      println(s"== building ${reps}x corpus at $dst from $src ==")
      buildScaled(spark, src, dst, reps)
    } else println(s"== reusing ${reps}x corpus at $dst ==")

    def consume(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save()
      -1L
    }
    def run(name: String, dir: String): (Double, Long, Double) = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm (plan + IO caches); rows from the warm run
      val rows = fn(spark, dir).count()
      val (w0, _) = tally.snapshot
      val t0 = System.nanoTime()
      consume(fn(spark, dir))
      val sec = (System.nanoTime() - t0) / 1e9
      val (w1, _) = tally.snapshot
      (sec, rows, (w1 - w0) / 1048576.0)
    }

    println(f"${"query"}%-22s ${"s@.1"}%8s ${"s@.5"}%8s ${"xT/5"}%6s ${"MB@.1"}%9s ${"MB@.5"}%9s ${"xMB/5"}%6s ${"rows@.5"}%9s")
    val only = args.lift(1).map(_.split(",").toSet)
    for (q <- AuditQueries if only.forall(_.exists(q.contains))) {
      val (s1, _, m1) = run(q, src)
      val (s5, r5, m5) = run(q, dst)
      val tRatio = s5 / s1 / reps
      val mRatio = if (m1 > 0.01) m5 / m1 / reps else Double.NaN
      println(f"$q%-22s $s1%8.2f $s5%8.2f $tRatio%6.2f $m1%9.1f $m5%9.1f $mRatio%6.2f $r5%9d")
    }

    // The semantic family re-measured under the SCALE RULE: k grows with
    // the corpus (targetCell holds E|cell| ≈ 125, matching k=16 at sf0.1)
    // — Σ|cell|² returns to ~linear, unlike the fixed-k query above.
    if (only.forall(_.exists("semantic_autok".contains))) {
      def runSem(dir: String): (Double, Long, Double) = {
        def q = operators.Dedup.semanticDedup(
          spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
          threshold = 0.2, k = 16, nprobe = 1, targetCell = 125)
        q.count() // warm
        val rows = q.count()
        val (w0, _) = tally.snapshot
        val t0 = System.nanoTime()
        consume(q)
        val sec = (System.nanoTime() - t0) / 1e9
        val (w1, _) = tally.snapshot
        (sec, rows, (w1 - w0) / 1048576.0)
      }
      val (s1, _, m1) = runSem(src)
      val (s5, r5, m5) = runSem(dst)
      println(f"${"semantic_autok"}%-22s $s1%8.2f $s5%8.2f ${s5 / s1 / reps}%6.2f $m1%9.1f $m5%9.1f ${m5 / m1 / reps}%6.2f $r5%9d")
    }
    spark.stop()
  }
}
