// Bench-faithful CC profiling: spark-shell -i tools/profile_cc3.scala
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}
val docs = spark.read.parquet(s"$dir/documents.parquet")
docs.count()
for (i <- 1 to 2) {
  time(s"q_dedup_cc full run$i") {
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.2)
    val cc = time(s"  cc call$i")(
      graft.operators.Dedup.connectedComponents(docs.select(col("doc_id")), pairs, "doc_id"))
    time(s"  consume$i")(cc.write.format("noop").mode("overwrite").save())
  }
  System.gc()
}
System.exit(0)
