package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: mean/min per-query recall@10 of the q_rag_pipeline IVF-PQ
  * serving path (nprobe 4 / shortlist 32 over 16 cells) against the exact
  * cosine ranking, at a given SF dir — the measurement behind the query's
  * 0.5 mean-recall floor (sf0.001: 0.70, sf0.01: 0.685; deterministic
  * training, so the gate is stable, not flaky).
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
    val ivf = operators.IvfIndex.train(emb, "vec_id", "embedding", k = 16)
    val pq = operators.ProductQuantize.train(emb, "vec_id", "embedding", m = 4, k = 16)
    val ann = operators.IvfPq.topK(queries, corpus, ivf, pq, k = 10,
      nprobe = 4, shortlist = 32).localCheckpoint()
    val rec = exact.select(col("query_id"), col("neighbor_id"))
      .join(ann.select(col("query_id"), col("neighbor_id"), lit(1L).as("h")),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg((sum(coalesce(col("h"), lit(0L))) / count(lit(1))).as("r"))
    rec.agg(avg("r").as("mean"), min("r").as("min")).show()
    spark.stop()
  }
}
