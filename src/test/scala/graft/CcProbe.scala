package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
    val p = t("pairs persist+count") { val x = pairs.persist(); x.count(); x }
    val edges = p.select(col("idA").as("src"), col("idB").as("dst"))
      .union(p.select(col("idB").as("src"), col("idA").as("dst")))
    var labels = docs.select(col("doc_id").as("id")).distinct()
      .withColumn("component", col("id")).persist()
    t("labels init count")(labels.count())
    for (i <- 1 to 6) {
      t(s"iter $i") {
        val msgs = edges.alias("e")
          .join(labels.alias("l"), col("e.src") === col("l.id"))
          .select(col("e.dst").as("id"), col("l.component").as("component"))
        val next = labels.select("id", "component").union(msgs)
          .groupBy("id").agg(min("component").as("component")).persist()
        val s = next.agg(sum(col("component").cast("decimal(38,0)"))).head.getDecimal(0)
        labels.unpersist()
        labels = next
        s
      }
    }
    spark.stop()
  }
}
