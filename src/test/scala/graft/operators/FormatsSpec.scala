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
}
