package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sink.Warehouse

/** Persisted standing n-gram dedup index (round-11 directive #7):
  * append-per-batch parquet writes, warehouse compaction, reload — the
  * reloaded index must be row-identical to the in-memory sets and the
  * pair output must be byte-identical to the un-persisted incremental
  * path (the q_dedup_incremental_indexed oracle gates the same thing
  * end-to-end; this spec pins the file-level lifecycle too). */
class NgramIndexSpec extends SparkSpec {

  private def parquetFiles(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .count(f => f.getName.endsWith(".parquet"))

  test("append + compact + reload: identical sets, identical pairs, fewer files") {
    val docs = spark.read.parquet(s"${testDataDir()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    val delta = docs.filter(col("doc_id") % 10 === 9)
    val path = Files.createTempDirectory("ngram_index").toString + "/index"

    // two per-batch appends, each shuffle-partitioned -> many small files
    Dedup.saveNgramIndex(
      Dedup.hashedShingles(corpus.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", 3).repartition(4), path, mode = "overwrite")
    Dedup.saveNgramIndex(
      Dedup.hashedShingles(corpus.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", 3).repartition(4), path)
    val before = parquetFiles(path)
    assert(before >= 8, s"expected >=8 small files before compaction, got $before")

    Warehouse.compact(spark, path)
    val after = parquetFiles(path)
    assert(after < before && after >= 1,
      s"compaction should shrink the file count ($before -> $after)")

    // reloaded index == in-memory sets, row for row
    val reloaded = Dedup.loadNgramIndex(spark, path)
    val direct = Dedup.hashedShingles(corpus, "doc_id", "text", 3)
    assert(reloaded.count() === direct.count())
    assert(reloaded.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(reloaded).count() === 0)

    // pair output byte-identical to the un-persisted incremental path
    val deltaSets = Dedup.hashedShingles(delta, "doc_id", "text", 3)
    val fromIndex = Dedup.incrementalNgramPairsFromSets(reloaded, deltaSets, 0.2)
      .orderBy("idA", "idB").collect().toSeq
    val inMemory = Dedup.incrementalNgramPairs(corpus, delta,
        "doc_id", "text", 3, 0.2)
      .orderBy("idA", "idB").collect().toSeq
    assert(fromIndex === inMemory)
  }
}
