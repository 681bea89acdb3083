package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.SetSketch

class KmvAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("buffer: serialize round-trips k, n, and the hash set") {
    val buf = new KmvBuffer(64)
    (1L to 5000L).foreach(buf.addValue)
    val back = KmvBuffer.deserialize(buf.serialize())
    assert(back.k == 64 && back.n == buf.n)
    assert(back.hashes == buf.hashes)
    assert(back.estimate == buf.estimate)
  }

  test("buffer: keeps the k smallest distinct hashes in UNSIGNED order") {
    val buf = new KmvBuffer(4)
    // raw hashes incl. negative longs = top-half unsigned values
    Seq(10L, -1L, 5L, 7L, 3L, -100L, 5L, 7L).foreach(buf.addHash)
    // unsigned order: 3 < 5 < 7 < 10 < ... < -100 < -1
    assert(buf.hashes.size == 4)
    val kept = { val it = buf.hashes.iterator(); Seq.fill(4)(it.next().longValue) }
    assert(kept == Seq(3L, 5L, 7L, 10L))
    assert(buf.full && buf.thetaHash.contains(10L))
  }

  test("exact regime below capacity; estimate within 3-sigma RSE when full") {
    val small = new KmvBuffer(512)
    (1L to 300L).foreach(v => { small.addValue(v); small.addValue(v) })
    assert(small.estimate == 300.0) // non-full sketch is the exact set
    assert(small.n == 600)          // n is the exact ROW count
    val big = new KmvBuffer(512)
    (1L to 100000L).foreach(big.addValue)
    assert(math.abs(big.estimate - 100000.0) <=
      3 * KmvBuffer.rse(512) * 100000.0)
  }

  test("set-union merge equals the single-pass sketch, byte-exact") {
    val all = new KmvBuffer(256)
    val (a, b, c) = (new KmvBuffer(256), new KmvBuffer(256), new KmvBuffer(256))
    (1L to 30000L).foreach { v =>
      all.addValue(v)
      // overlapping thirds — the hash-set union must not double count
      if (v <= 15000) a.addValue(v)
      if (v > 5000 && v <= 25000) b.addValue(v)
      if (v > 20000) c.addValue(v)
    }
    a.mergeIn(b); a.mergeIn(c)
    assert(a.hashes == all.hashes,
      "merged hash set diverges from the single-pass sketch")
    assert(a.n == 15000 + 20000 + 10000) // row counts add; overlaps twice
    intercept[IllegalArgumentException] { a.mergeIn(new KmvBuffer(128)) }
  }

  private def setOp(a: KmvBuffer, b: KmvBuffer): (Long, Long, Long, Long) = {
    val r = Seq((a.serialize(), b.serialize())).toDF("a", "b")
      .select(SetSketch.kmvSetOp(col("a"), col("b")).as("o"))
      .select(col("o.union_est"), col("o.intersect_est"),
        col("o.diff_ab_est"), col("o.jaccard_ppm")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("set op is EXACT when neither sketch is full") {
    val a = new KmvBuffer(512); val b = new KmvBuffer(512)
    (1L to 300L).foreach(a.addValue)       // A = [1,300]
    (201L to 450L).foreach(b.addValue)     // B = [201,450], |A∩B| = 100
    val (u, i, d, j) = setOp(a, b)
    assert(u == 450L && i == 100L && d == 200L)
    assert(j == (1000000L * 100) / 450)    // integer-division ppm
  }

  test("set op estimates within 6-sigma bounds when full") {
    val a = new KmvBuffer(512); val b = new KmvBuffer(512)
    (1L to 60000L).foreach(a.addValue)       // |A| = 60k
    (40001L to 100000L).foreach(b.addValue)  // |B| = 60k, ∩ = 20k, ∪ = 100k
    val (u, i, d, j) = setOp(a, b)
    val bound = 6 * KmvBuffer.rse(512) * 100000.0
    assert(math.abs(u - 100000.0) <= bound)
    assert(math.abs(i - 20000.0) <= bound)
    assert(math.abs(d - 40000.0) <= bound)
    assert(math.abs(j - 200000.0) <= 6 * 0.5 / math.sqrt(512.0) * 1e6)
  }

  test("aggregate is partitioning-invariant, byte-exact, and ignores nulls") {
    val df = (1 to 20000)
      .map(i => (if (i % 13 == 0) None else Some((i % 3000).toLong), i))
      .toDF("v", "i")
    def sketch(parts: Int): Array[Byte] =
      df.repartition(parts, col("i"))
        .agg(SetSketch.kmvSketch(col("v"), 128).as("sk"))
        .head().getAs[Array[Byte]]("sk")
    val one = sketch(1)
    assert(one.sameElements(sketch(7)) && one.sameElements(sketch(4)),
      "sketch bytes depend on partitioning — not a pure set function")
    val buf = KmvBuffer.deserialize(one)
    assert(buf.n == (1 to 20000).count(_ % 13 != 0)) // nulls not counted
  }

  test("merge aggregate over per-segment sketches == direct global, byte-exact") {
    val df = (1L to 12000L).map(v => (v % 3, v % 2500)).toDF("seg", "v")
    val merged = df.groupBy(col("seg"))
      .agg(SetSketch.kmvSketch(col("v"), 256).as("sk"))
      .agg(SetSketch.kmvMerge(col("sk")).as("m"))
      .head().getAs[Array[Byte]]("m")
    val direct = df.agg(SetSketch.kmvSketch(col("v"), 256).as("m"))
      .head().getAs[Array[Byte]]("m")
    assert(merged.sameElements(direct))
    val est = df.agg(SetSketch.kmvEstimate(
        SetSketch.kmvSketch(col("v"), 4096)).as("e"))
      .select(col("e.n"), col("e.est")).head()
    assert(est.getLong(0) == 12000L && est.getLong(1) == 2500L) // exact regime
  }

  test("pairOverlap matches pairOverlapExact on testdata; violations empty") {
    val li = spark.read.parquet(s"${testDataDir()}/lineitem.parquet")
    val viol = SetSketch.pairOverlapViolations(
      li, "l_returnflag", "l_orderkey", k = 512).collect()
    assert(viol.isEmpty, viol.mkString("; "))
    val exact = SetSketch.pairOverlapExact(li, "l_returnflag", "l_orderkey")
      .orderBy(col("seg_a"), col("seg_b")).collect()
    assert(exact.length == 3) // A<N, A<R, N<R
    // sanity on shape: union >= each diff + intersect, jaccard in [0, 1e6]
    exact.foreach { r =>
      val (u, i, d, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(u >= i && u >= d + i && j >= 0 && j <= 1000000L)
    }
  }

  test("empty and disjoint inputs degrade gracefully") {
    val empty = spark.emptyDataFrame.select(lit(1L).as("v")).filter(lit(false))
    val sk = empty.agg(SetSketch.kmvSketch(col("v"), 64).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val buf = KmvBuffer.deserialize(sk)
    assert(buf.n == 0 && buf.hashes.isEmpty && buf.estimate == 0.0)
    // disjoint full sketches: intersection estimate must be near zero
    val a = new KmvBuffer(512); val b = new KmvBuffer(512)
    (1L to 50000L).foreach(a.addValue)
    (100001L to 150000L).foreach(b.addValue)
    val (_, i, _, j) = setOp(a, b)
    assert(i <= 6 * KmvBuffer.rse(512) * 100000.0)
    assert(j <= 6 * 0.5 / math.sqrt(512.0) * 1e6)
  }
}
