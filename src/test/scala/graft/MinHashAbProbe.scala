package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.expr.MinHashExpressions

/** Scratch diagnostic main (test scope — not shipped): A/B stamp for the
  * round-11 directive-#4 port — the retired shingle/minhash UDFs vs the
  * codegen expressions, each timed as the full signature projection over
  * the documents table (noop write so every row is computed), min of 3
  * alternating runs per side. */
object MinHashAbProbe {
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
      .select("doc_id", "text")

    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def udfRun(): Double = {
      val t0 = System.nanoTime()
      consume(docs.select(col("doc_id"),
          Dedup.shingleUdf(3)(col("text")).as("sh"))
        .withColumn("sig", Dedup.minhashSignatureUdf(64)(col("sh"))))
      (System.nanoTime() - t0) / 1e9
    }
    def exprRun(): Double = {
      val t0 = System.nanoTime()
      consume(docs.select(col("doc_id"),
          MinHashExpressions.shingle_array(col("text"), 3).as("sh"))
        .withColumn("sig", MinHashExpressions.minhash_signature(col("sh"), 64)))
      (System.nanoTime() - t0) / 1e9
    }

    // warm both paths once, then alternate
    udfRun(); exprRun()
    val udfTimes = Array.fill(3)(0.0)
    val exprTimes = Array.fill(3)(0.0)
    for (i <- 0 until 3) { udfTimes(i) = udfRun(); exprTimes(i) = exprRun() }
    println(f"udf  min=${udfTimes.min}%.3f s  runs=${udfTimes.map(t => f"$t%.3f").mkString(",")}")
    println(f"expr min=${exprTimes.min}%.3f s  runs=${exprTimes.map(t => f"$t%.3f").mkString(",")}")
    println(f"speedup(min/min) = ${udfTimes.min / exprTimes.min}%.2fx")
    spark.stop()
  }
}
