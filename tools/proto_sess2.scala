import org.apache.spark.sql.functions._
import spark.implicits._
val gapUs = 100L
val ev = Seq(
  (10L, 1L, 0L), (11L, 1L, 100L * 1000),
  (12L, 1L, 199L * 1000), (13L, 2L, 50L * 1000),
).toDF("event_id", "user_id", "ts")
val dir = java.nio.file.Files.createTempDirectory("sess-spec").toString
ev.write.mode("overwrite").parquet(dir + "/events.parquet")
val out = graft.streaming.StreamingIngest.runSessionizeBounded(
  spark, dir + "/events.parquet", gapUs, "sess_spec_q")
println("ALL ROWS (incl sentinel):")
spark.table("sess_spec_q").show(10)
println("filtered:")
out.show(10)
System.exit(0)
