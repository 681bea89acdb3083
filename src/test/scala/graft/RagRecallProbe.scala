package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: the nprobe × shortlist serving-frontier sweep of the
  * q_rag_pipeline IVF-PQ path against the exact cosine ranking —
  * mean/min per-query recall@10 and search seconds per operating point,
  * plus the corpus-scaled point ([[graft.operators.IvfPq.servingKnobs]])
  * the query actually runs. The round-18 measurements behind the
  * query's 0.8 mean-recall floor are recorded in BASELINE.md
  * (deterministic training, so the gate is stable, not flaky).
  * Run: sbt "Test/runMain graft.RagRecallProbe /root/testdata/sf0.01" */
object RagRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = operators.TextExtract.slidingChunks(
        docs.select(col("doc_id"), col("text")), "doc_id", "text", 32, 8)
      .select((col("doc_id") * 4096L + col("chunk_id")).as("vec_id"),
        col("doc_id"), col("chunk_id"),
        operators.Similarity.hashedEmbedding(col("chunk_text"), 16).as("embedding"))
      .localCheckpoint()
    val isQ = pmod(col("doc_id"), lit(25)) === 7 && col("chunk_id") === 0L
    val queries = emb.filter(isQ); val corpus = emb.filter(!isQ)
    val exact = operators.Similarity.cosineTopK(queries, corpus, 10).localCheckpoint()
    val n = emb.count()
    val (cells, scaledProbe, scaledShort) = graft.operators.IvfPq.servingKnobs(n)
    println(s"SWEEP corpus n=$n cells=$cells scaled=($scaledProbe, $scaledShort)")
    val ivf = operators.IvfIndex.train(emb, "vec_id", "embedding", k = cells)
    val pq = operators.ProductQuantize.train(emb, "vec_id", "embedding", m = 4, k = 16)
    // the production shape indexes once; the sweep varies only the
    // search knobs, so codes are shared across operating points
    val indexed = operators.IvfPq.index(corpus, ivf, pq).localCheckpoint()
    for ((nprobe, shortlist) <- Seq((4, 32), (4, 64), (8, 32), (8, 64),
        (16, 32), (16, 64), (scaledProbe, scaledShort))) {
      val t0 = System.nanoTime()
      val ann = operators.IvfPq.topKIndexed(queries, indexed, corpus, ivf,
        pq, k = 10, nprobe = nprobe, shortlist = shortlist).localCheckpoint()
      val secs = (System.nanoTime() - t0) / 1e9
      val rec = exact.select(col("query_id"), col("neighbor_id"))
        .join(ann.select(col("query_id"), col("neighbor_id"), lit(1L).as("h")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((sum(coalesce(col("h"), lit(0L))) / count(lit(1))).as("r"))
      val row = rec.agg(avg("r").as("mean"), min("r").as("min")).collect()(0)
      println(f"SWEEP nprobe=$nprobe%2d shortlist=$shortlist%2d " +
        f"mean_recall=${row.getDouble(0)}%.4f min_recall=${row.getDouble(1)}%.4f " +
        f"search_sec=$secs%.2f")
    }
    spark.stop()
  }
}
