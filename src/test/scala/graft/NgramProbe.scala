package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch diagnostic main (test scope — not shipped): stage-level timings
  * for the n-gram Jaccard candidate pipeline at a given SF dir. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t = 0.2

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }

    timed("FULL query uncached")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t).count())
    timed("FULL query uncached again")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t).count())

    val withSh = docs
      .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("shs"))
      .select(col("id"),
        sort_array(array_distinct(transform(col("shs"), s => xxhash64(s)))).as("sh"))
      .cache()
    timed("docs+shingles")(withSh.count())
    val sh = withSh.select(col("id"), explode(col("sh")).as("h")).cache()
    timed("postings")(sh.count())
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df")).cache()
    timed("distinct shingles")(dfreq.count())
    val ordered = sh.join(dfreq, "h").groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("arr"))
    val prefixLen = (size(col("arr")) - ceil(lit(t) * size(col("arr"))) + 1).cast("int")
    val prefix = ordered.select(col("id"), explode(slice(col("arr"), lit(1), prefixLen)).as("e"))
      .select(col("id"), col("e.h").as("h")).cache()
    timed("prefix postings")(prefix.count())
    val cands = prefix.select(col("id").as("idA"), col("h"))
      .join(prefix.select(col("id").as("idB"), col("h")), "h")
      .filter(col("idA") < col("idB"))
      .select("idA", "idB").distinct().cache()
    timed("candidate pairs")(cands.count())
    val a = withSh.select(col("id").as("idA"), col("sh").as("shA"), size(col("sh")).as("nA"))
    val b = withSh.select(col("id").as("idB"), col("sh").as("shB"), size(col("sh")).as("nB"))
    val out = cands.join(a, "idA").join(b, "idB")
      .withColumn("c", graft.expr.VectorExpressions.sorted_long_intersect_size(col("shA"), col("shB")))
      .withColumn("jaccard", col("c").cast("double") / (col("nA") + col("nB") - col("c")))
      .filter(col("jaccard") >= t)
    timed("verified pairs")(out.count())
    out.explain("formatted")
    spark.stop()
  }
}
