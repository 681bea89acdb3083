// Scratch profiling: spark-shell -i tools/profile_ngram.scala
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}
val docs = spark.read.parquet(s"$dir/documents.parquet")
println("docs=" + docs.count())
// stage 1: shingle + hash + sort + localCheckpoint (this is eager)
val withSh = time("withSh checkpoint")(
  docs.select(col("doc_id").as("id"),
      graft.operators.Dedup.shingles(col("text"), 3).as("shs"))
    .select(col("id"), sort_array(array_distinct(transform(col("shs"), s => xxhash64(s)))).as("sh"))
    .localCheckpoint())
val sh = withSh.select(col("id"), explode(col("sh")).as("h"))
println("shingle rows=" + time("explode count")(sh.count()))
val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
val ordered = sh.join(dfreq, "h").groupBy("id")
  .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("arr"))
val prefixLen = (size(col("arr")) - ceil(lit(0.2) * size(col("arr"))) + 1).cast("int")
val prefix = ordered.select(col("id"), explode(slice(col("arr"), lit(1), prefixLen)).as("e"))
  .select(col("id"), col("e.h").as("h")).localCheckpoint()
println("prefix rows=" + prefix.count())
val cands = prefix.select(col("id").as("idA"), col("h"))
  .join(prefix.select(col("id").as("idB"), col("h")), "h")
  .filter(col("idA") < col("idB")).select("idA", "idB")
println("cand pairs pre-distinct=" + time("cand join")(cands.count()))
val candsD = cands.distinct()
println("cand pairs distinct=" + time("cand distinct")(candsD.count()))
val full = time("full pairs")(
  graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2).count())
println("pairs=" + full)
System.exit(0)
