package graft.operators

import org.apache.spark.sql.functions._

/** Z-order layout: encoding bit-exactness and the locality property the
  * layout exists for (files cover squares, not stripes). */
class ZOrderSpec extends graft.SparkSpec {

  /** Naive bit-by-bit interleave as the independent reference. */
  private def naiveZ(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  test("zValueLong == naive interleave; column expr == JVM reference") {
    val rnd = new scala.util.Random(3)
    val cases = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    cases.foreach { case (a, b) =>
      assert(ZOrder.zValueLong(a, b) == naiveZ(a, b), s"($a, $b)")
    }
    import spark.implicits._
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrder.zValueLong(r.getLong(0), r.getLong(1)))
    }
  }

  test("hilbert: exhaustive bijection + unit-step adjacency on the full grid") {
    // bits=4 -> every (x,y) in 16x16 maps to a distinct d in [0, 256)
    val cells = for (x <- 0L until 16L; y <- 0L until 16L)
      yield ZOrder.hilbertValueLong(x, y, bits = 4) -> ((x, y))
    val byD = cells.toMap
    assert(byD.size == 256 && byD.keySet == (0L until 256L).toSet,
      "xy2d must be a bijection onto [0, 4^bits)")
    // the defining Hilbert property (and the locality win over Morton):
    // consecutive d are Manhattan-ADJACENT cells — step length always 1
    (0L until 255L).foreach { d =>
      val ((x1, y1), (x2, y2)) = (byD(d), byD(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step between d=$d and ${d + 1}")
    }
    // Morton, by contrast, jumps: its max consecutive step exceeds 1
    val mortonMax = (0 until 255).map { i =>
      val Seq((x1, y1), (x2, y2)) = Seq(i, i + 1).map { d =>
        ((0 until 4).foldLeft(0L)((a, k) => a | (((d.toLong >> (2 * k + 1)) & 1) << k)),
          (0 until 4).foldLeft(0L)((a, k) => a | (((d.toLong >> (2 * k)) & 1) << k)))
      }
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(mortonMax > 1, "sanity: Morton jumps; Hilbert is what fixes it")
  }

  test("hilbert column ladder == JVM reference at full 16-bit width") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L)) ++
      Seq.fill(300)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    import spark.implicits._
    val got = ZOrder.withHilbertValue(cases.toDF("a", "b"), "a", "b", "h")
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder.hilbertValueLong(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // full-width range check: d must stay within [0, 4^16)
    got.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) < (1L << 32)))
  }

  test("z-curve monotone locality: z-range partitions bound both dims") {
    import spark.implicits._
    // 64x64 uniform grid, 16 z-range partitions => ~squares of side 16
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val df = grid.toDF("a", "b")
      .withColumn("z", ZOrder.zValue(col("a"), col("b")))
      .repartitionByRange(16, col("z"))
    val ranges = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val meanRa = ranges.map(_._1).sum.toDouble / ranges.length
    val meanRb = ranges.map(_._2).sum.toDouble / ranges.length
    // sorting by `a` alone would give meanRb ~= 63; z-order keeps BOTH
    // dimensions bounded (a perfect 16-way z-split of a 64x64 grid yields
    // 16x16 squares => range 15 each; range boundaries are sampled, so
    // allow slack)
    assert(meanRa < 32.0, s"a-ranges not clustered: ${ranges.mkString(",")}")
    assert(meanRb < 32.0, s"b-ranges not clustered: ${ranges.mkString(",")}")
  }

  test("hilbert range partitions bound both dims at least as tightly as z") {
    import spark.implicits._
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    def meanRanges(curve: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) = {
      val ranges = grid.toDF("a", "b")
        .withColumn("v", curve(col("a"), col("b")))
        .repartitionByRange(16, col("v"))
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      (ranges.map(_._1).sum.toDouble / ranges.length,
        ranges.map(_._2).sum.toDouble / ranges.length)
    }
    val (hA, hB) = meanRanges(ZOrder.hilbertColumn(_, _))
    assert(hA < 32.0 && hB < 32.0, s"hilbert not clustered: $hA, $hB")
    // the locality argument made quantitative: mean bounding-box AREA of a
    // 16-way split is no worse than Morton's on the same grid
    val (zA, zB) = meanRanges(ZOrder.zValue)
    assert(hA * hB <= zA * zB * 1.05,
      s"hilbert boxes ($hA x $hB) should not exceed Morton's ($zA x $zB)")
  }

  test("hilbertWrite: written files have square locality in both columns") {
    import spark.implicits._
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val dir = java.nio.file.Files.createTempDirectory("graft-hilbert").toString
    try {
      ZOrder.hilbertWrite(grid.toDF("a", "b"), "a", "b", dir, numFiles = 16)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length > 1)
      val perFile = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("a") - min("a"), max("b") - min("b")).head()
        (r.getLong(0), r.getLong(1))
      }
      val meanA = perFile.map(_._1).sum.toDouble / perFile.length
      val meanB = perFile.map(_._2).sum.toDouble / perFile.length
      assert(meanA < 32.0 && meanB < 32.0,
        s"files are stripes, not squares: ${perFile.mkString(",")}")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("zorderWrite: written files have square locality in both columns") {
    import spark.implicits._
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      ZOrder.zorderWrite(grid.toDF("a", "b"), "a", "b", dir, numFiles = 16)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length > 1)
      val perFile = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("a") - min("a"), max("b") - min("b")).head
        (r.getLong(0), r.getLong(1))
      }
      assert(perFile.map(_._1).sum.toDouble / perFile.length < 32.0)
      assert(perFile.map(_._2).sum.toDouble / perFile.length < 32.0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("zorderWrite quantizes wide domains (no 16-bit masking stripes)") {
    import spark.implicits._
    // keys far beyond 16 bits: raw zValue would interleave key mod 65536
    // and every file would span nearly the whole real range
    val grid = for (a <- 0L until 64L; b <- 0L until 64L)
      yield (a * 100000L, b * 3000000L)
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-wide").toString
    try {
      ZOrder.zorderWrite(grid.toDF("a", "b"), "a", "b", dir, numFiles = 16)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val perFile = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("a") - min("a"), max("b") - min("b")).head
        (r.getLong(0), r.getLong(1))
      }
      // global ranges are 63*100000 and 63*3000000; square locality keeps
      // the mean per-file range well under half of each
      assert(perFile.map(_._1).sum.toDouble / perFile.length < 32.0 * 100000)
      assert(perFile.map(_._2).sum.toDouble / perFile.length < 32.0 * 3000000)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("rank quantizer keeps square locality on an exponentially skewed domain") {
    import spark.implicits._
    // monotone exponential skew: a' = 4^a (exactly representable powers of
    // two). Linear min/max scaling maps every a <= ~51 into bucket 0 (the
    // top value dominates the range), so the curve degenerates to stripes
    // in b; equi-depth rank buckets hold ~equal row mass per bucket and
    // keep both dimensions bounded. Rank position is kept as a plain
    // column for measurement.
    val grid = for (a <- 0L until 60L; b <- 0L until 60L)
      yield (a, math.pow(4.0, a.toDouble), b)
    val df = grid.toDF("a_rank", "a_skew", "b")

    def meanRanges(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length > 1)
      val perFile = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("a_rank") - min("a_rank"), max("b") - min("b")).head
        (r.getLong(0), r.getLong(1))
      }
      (perFile.map(_._1).sum.toDouble / perFile.length,
       perFile.map(_._2).sum.toDouble / perFile.length)
    }

    val dirLin = java.nio.file.Files.createTempDirectory("graft-z-lin").toString
    val dirRank = java.nio.file.Files.createTempDirectory("graft-z-rank").toString
    try {
      ZOrder.zorderWrite(df, "a_skew", "b", dirLin, numFiles = 16)
      ZOrder.zorderWrite(df, "a_skew", "b", dirRank, numFiles = 16,
        quantizer = "rank", rankBuckets = 64)
      val (linRa, _) = meanRanges(dirLin)
      val (rankRa, rankRb) = meanRanges(dirRank)
      // the linear quantizer demonstrably loses the skewed dimension...
      assert(linRa > 32.0,
        s"expected linear quantizer to stripe the skewed dim, got meanRa=$linRa")
      // ...while the rank quantizer bounds BOTH dims (a in rank space)
      assert(rankRa < 32.0, s"skewed dim not clustered under rank: $rankRa")
      assert(rankRb < 32.0, s"uniform dim not clustered under rank: $rankRb")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirLin))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirRank))
    }
  }
}
