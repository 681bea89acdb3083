// Reproduce bench context: corpus_pipeline then dedup_cc in one session.
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}
def consume(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
for (i <- 1 to 2) {
  time(s"q_corpus_pipeline$i")(consume(graft.SparkEntry.queries("q_corpus_pipeline")(spark, dir)))
  System.gc()
  time(s"q_dedup_cc$i")(consume(graft.SparkEntry.queries("q_dedup_cc")(spark, dir)))
  System.gc()
}
System.exit(0)
