// Scratch profiling: spark-shell -i tools/profile_json.scala
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}
val ev = spark.read.parquet(s"$dir/events.parquet")
println("events rows=" + ev.count())
ev.select(length(col("props")).as("l")).agg(avg("l"), max("l")).show()
val propsSchema = StructType(Seq(StructField("k", LongType)))
val q = ev.select(col("event_type"), from_json(col("props"), propsSchema).getField("k").as("k"))
  .groupBy(col("event_type")).agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
  .orderBy(col("event_type"))
time("from_json agg noop")(q.write.format("noop").mode("overwrite").save())
time("from_json agg noop 2nd")(q.write.format("noop").mode("overwrite").save())
val q2 = ev.select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
  .groupBy(col("event_type")).agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
  .orderBy(col("event_type"))
time("get_json_object agg noop")(q2.write.format("noop").mode("overwrite").save())
System.exit(0)
