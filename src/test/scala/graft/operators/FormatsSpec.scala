package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Formats

class FormatsSpec extends SparkSpec {

  test("every supported format round-trips typed columns byte-identically") {
    // dates, doubles, longs, strings — the types csv/json are most likely
    // to mangle without a re-applied schema
    val orders = spark.read.parquet(s"${testDataDir("0.01")}/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("d"))
      .limit(200)
    val want = orders.collect().map(_.toSeq).sortBy(_.toString()).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft-formats-spec").toString
    try {
      for (f <- Formats.supported) {
        val got = Formats.roundTrip(orders, f, s"$tmp/$f")
          .collect().map(_.toSeq).sortBy(_.toString()).toSeq
        assert(got == want, s"format $f mangled the round trip")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(tmp))
    intercept[IllegalArgumentException] {
      Formats.roundTrip(orders, "avro", s"$tmp/nope")
    }
  }

  test("readEvolved: files written under different schema versions union with NULL fill") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-evolve-spec").toString
    try {
      // v1 files: (k, v); v2 files add a quality column
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .write.mode("append").parquet(tmp)
      Seq((3L, "c", 0.9)).toDF("k", "v", "quality")
        .write.mode("append").parquet(tmp)
      val got = Formats.readEvolved(spark, tmp)
      assert(got.columns.sorted.toSeq === Seq("k", "quality", "v"),
        "merged schema must contain the late column")
      val rows = got.orderBy("k").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
      assert(rows(0).isNullAt(rows(0).fieldIndex("quality")),
        "old files surface the new column as NULL")
      assert(rows(2).getDouble(rows(2).fieldIndex("quality")) === 0.9)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(tmp))
  }

  test("readText: line mode splits per line, wholetext one row per file, lineage kept") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-text-spec")
    try {
      java.nio.file.Files.writeString(tmp.resolve("a.txt"), "doc one line 1\ndoc one line 2\n")
      java.nio.file.Files.writeString(tmp.resolve("b.txt"), "doc two\n")
      val lines = Formats.readText(spark, tmp.toString).collect()
      assert(lines.length === 3)
      assert(lines.map(_.getString(0)).sorted.toSeq ===
        Seq("doc one line 1", "doc one line 2", "doc two"))
      assert(lines.forall(_.getString(1).endsWith(".txt")), "source_file lineage missing")
      val whole = Formats.readText(spark, tmp.toString, wholeText = true).collect()
      assert(whole.length === 2)
      assert(whole.map(_.getString(0)).sorted.head.startsWith("doc one line 1\n"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  test("readBinary: glob prunes at listing, content round-trips byte-exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bin-spec")
    try {
      val payload = Array.tabulate[Byte](256)(i => i.toByte)
      java.nio.file.Files.write(tmp.resolve("x.bin"), payload)
      java.nio.file.Files.write(tmp.resolve("y.bin"), Array[Byte](1, 2, 3))
      java.nio.file.Files.writeString(tmp.resolve("skip.txt"), "not binary payload")
      val rows = Formats.readBinary(spark, tmp.toString, globFilter = "*.bin")
        .orderBy(col("path")).collect()
      assert(rows.length === 2, "glob filter must prune the .txt at listing time")
      assert(rows.map(_.getAs[Long]("length")).toSeq === Seq(256L, 3L))
      assert(rows(0).getAs[Array[Byte]]("content").toSeq === payload.toSeq)
      // the oversize guard fails at BUILD time from length metadata alone
      // (content column pruned — the blob's bytes are never read), names
      // the file, and is per-read (no session conf involved)
      val e = intercept[IllegalArgumentException] {
        Formats.readBinary(spark, tmp.toString, globFilter = "*.bin",
          maxBytesPerFile = 100)
      }
      assert(e.getMessage.contains("exceeds 100 bytes") &&
        e.getMessage.contains("x.bin"), e.getMessage)
      val fine = Formats.readBinary(spark, tmp.toString, globFilter = "*.bin",
        maxBytesPerFile = 1024).collect()
      assert(fine.length === 2, "an independent read with its own limit must succeed")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }
}
