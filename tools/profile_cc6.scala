// Reproduce the bench context: the 7 queries preceding q_dedup_cc (sorted
// order), then q_dedup_cc, twice - mirrors the Bench loop. ASCII only:
// spark-shell -i slurps scripts with the platform default charset.
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}
val names = Seq("q_a1_distinct", "q_agg_percentiles", "q_agg_pricing_summary",
  "q_agg_rollup", "q_approx_distinct", "q_asof_join", "q_corpus_pipeline",
  "q_dedup_cc")
for (pass <- 1 to 2; name <- names) {
  val t0 = System.nanoTime()
  try graft.SparkEntry.queries(name)(spark, dir)
    .write.format("noop").mode("overwrite").save()
  catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
  println(f"== $name pass$pass: ${(System.nanoTime - t0) / 1e9}%.2f s")
}
System.exit(0)
