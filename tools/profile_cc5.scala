import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}
spark.read.parquet(s"$dir/documents.parquet").count()
for (i <- 1 to 3) {
  time(s"q_dedup_cc$i")(
    graft.SparkEntry.queries("q_dedup_cc")(spark, dir)
      .write.format("noop").mode("overwrite").save())
  System.gc()
}
System.exit(0)
