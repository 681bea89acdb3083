// Scratch profiling script: spark-shell -i tools/profile_cc.scala
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.session.timeZone", "UTC")
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}
val docs = spark.read.parquet(s"$dir/documents.parquet")
val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.2)
time("pairs materialize")(println("pairs=" + pairs.count()))
val cc = time("cc total")(
  graft.operators.Dedup.connectedComponents(docs.select(col("doc_id")), pairs, "doc_id"))
time("cc consume")(println("cc=" + cc.count()))
System.exit(0)
