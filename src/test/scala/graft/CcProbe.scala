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
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = t("pairs build+count") {
      val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2).persist()
      p.count(); p
    }
    val cc = t("connectedComponents") {
      Dedup.connectedComponents(docs.select(col("doc_id")), pairs, "doc_id")
    }
    t("final count")(cc.count())
    val cc2 = t("connectedComponents 2") {
      Dedup.connectedComponents(docs.select(col("doc_id")), pairs, "doc_id")
    }
    t("final count 2")(cc2.count())
    spark.stop()
  }
}
