package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

/** One-off agreement probe for the bitext IVF serving gate: measures
  * best-tgt agreement of the shortlist-margin path against the exact
  * miner across (nprobe, k) to pick the gate's spec-measured floor.
  * Run: sbt "Test/runMain graft.BitextProbe /root/testdata/sf0.01" */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false)
      .appName("bitext-probe").getOrCreate()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val src = emb.filter(col("vec_id") % 17 === 0)
      .withColumn("embedding",
        transform(col("embedding").cast("array<float>"), (v, i) =>
          when(i.cast("long") ===
              pmod(col("vec_id"), size(col("embedding")).cast("long")),
            lit(1.0f)).otherwise(v)))
    val exact = Similarity.bitextMine(src, emb, 4, 1050000L).localCheckpoint()
    val n = emb.count()
    val (cells, nprobeS, shortlistS) = graft.operators.IvfPq.servingKnobs(n)
    println(s"PROBE scaled knobs: n=$n cells=$cells nprobe=$nprobeS shortlist=$shortlistS")
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = cells)
    for ((np, kk) <- Seq((nprobeS, shortlistS), (nprobeS * 2, shortlistS),
        (cells / 2, shortlistS), (cells, shortlistS))) {
      val sl = IvfIndex.topK(
        src.withColumn("vec_id", col("vec_id") + lit(1000000L)),
        emb, model, k = kk, nprobe = np)
      val scored = sl.select((col("query_id") - 1000000L).as("src_id"),
        col("neighbor_id").as("tgt_id"),
        round(col("cosine") * 1e6).cast("long").as("c_ppm"))
      val mined = Similarity.marginMine(scored, 4, 1050000L)
      val j = exact.select(col("src_id"), col("tgt_id").as("te"))
        .join(mined.select(col("src_id"), col("tgt_id").as("ti")),
          Seq("src_id"), "left")
      val a = j.agg(avg(when(col("ti") === col("te"), 1.0).otherwise(0.0)))
        .head.getDouble(0)
      println(f"PROBE nprobe=$np%2d k=$kk%3d agreement=$a%.3f")
    }
    spark.stop()
  }
}
