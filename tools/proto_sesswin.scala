// Prototype: session_window streaming over a bounded file stream.
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.01"
val ev = spark.read.parquet(s"$dir/events.parquet")
val schema = ev.schema
// stage: events + one far-future sentinel to push the watermark past every
// real session end
val stage = java.nio.file.Files.createTempDirectory("sess-stage").toString
ev.write.mode("overwrite").parquet(stage)
val maxTs = ev.agg(max(col("ts"))).head.getLong(0)
val gapNs = 1800L * 1000 * 1000 * 1000
ev.limit(1)
  .withColumn("event_id", lit(-1L))
  .withColumn("user_id", lit(-1L))
  .withColumn("ts", lit(maxTs + 3 * gapNs))
  .write.mode("append").parquet(stage)
val stream = spark.readStream.schema(schema).parquet(stage + "/*.parquet")
  .withColumn("tsm", timestamp_micros(expr("ts div 1000")))
val q = stream
  .withWatermark("tsm", "0 seconds")
  .groupBy(session_window(col("tsm"), "30 minutes"), col("user_id"))
  .agg(count(lit(1)).as("n_events"), min(col("tsm")).as("first_ev"))
  .select(col("user_id"), unix_micros(col("session_window.start")).as("session_start"),
    unix_micros(col("session_window.end")).as("win_end"), col("n_events"))
  .writeStream.outputMode("append").format("memory").queryName("sess").start()
q.processAllAvailable()
q.stop()
val out = spark.table("sess").filter(col("user_id") >= 0)
println("rows=" + out.count())
out.orderBy("user_id", "session_start").show(8)
// compare with batch sessionize under >= gap semantics
val batch = spark.read.parquet(s"$dir/events.parquet")
  .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
import org.apache.spark.sql.expressions.Window
val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
val lagUs = lag(col("us"), 1).over(w)
val flagged = batch.withColumn("ns",
  when(lagUs.isNull || col("us") - lagUs >= 1800L * 1000 * 1000, 1L).otherwise(0L))
val lab = flagged.withColumn("seq", sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
val bs = lab.groupBy("user_id", "seq").agg(min("us").as("session_start"), count(lit(1)).as("n_events"))
println("batch sessions=" + bs.count())
val j = out.select(col("user_id"), col("session_start"), col("n_events"))
  .except(bs.select(col("user_id"), col("session_start"), col("n_events")))
println("stream-minus-batch=" + j.count())
val j2 = bs.select(col("user_id"), col("session_start"), col("n_events"))
  .except(out.select(col("user_id"), col("session_start"), col("n_events")))
println("batch-minus-stream=" + j2.count())
System.exit(0)
