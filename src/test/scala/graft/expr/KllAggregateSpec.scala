package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** Buffer-level properties of the KLL compactor stack: the self-reported
  * worst-case rank ledger must hold for EVERY threshold on random streams,
  * random partitionings and random merge orders; total weight is conserved
  * exactly; memory stays k·levels-bounded; serialization round-trips.
  * Buffer level only — no Spark jobs — so the trial loops run fast.
  */
class KllAggregateSpec extends AnyFunSuite {

  /** Σ weight of summary items ≤ x — the sketch's rank estimate. */
  private def sketchRank(buf: KllBuffer, x: Long): Long =
    buf.items.collect { case (v, w) if v <= x => w }.sum

  private def checkLedger(buf: KllBuffer, stream: Seq[Long], tag: String): Unit = {
    val sorted = stream.sorted
    // every distinct stream value and a few off-grid thresholds
    val thresholds = (stream.distinct ++ Seq(Long.MinValue, Long.MaxValue,
      sorted(sorted.size / 2) + 1)).distinct
    thresholds.foreach { x =>
      val trueRank = sorted.count(_ <= x).toLong
      val est = sketchRank(buf, x)
      assert(math.abs(est - trueRank) <= buf.err,
        s"$tag: rank($x) est=$est true=$trueRank err=${buf.err}")
    }
  }

  test("rank ledger holds on random streams; weight conserved; memory bounded") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 30) {
      // k large enough relative to n that the ledger is sub-linear:
      // err ~ n·log2(n/k)/k, so k >= 64 keeps eps <= ~12% at n = 20000
      val k = 64 << rnd.nextInt(3) // 64..256
      val n = 1 + rnd.nextInt(20000)
      val stream = Seq.fill(n)(rnd.nextLong() % 10000)
      val buf = new KllBuffer(k)
      stream.foreach(buf.add)
      assert(buf.n == n)
      assert(buf.items.map(_._2).sum == n, s"trial $trial: weight not conserved")
      assert(buf.levels.map(_.length).sum <= k * buf.levels.length,
        s"trial $trial: memory exceeds k x levels")
      // the error ledger must be meaningfully sub-linear, not vacuous
      assert(buf.err < n || n < k,
        s"trial $trial: err=${buf.err} >= n=$n — ledger is vacuous")
      checkLedger(buf, stream, s"trial $trial k=$k single-pass")
    }
  }

  test("rank ledger survives random partitioning + random merge order") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 30) {
      val k = 64 << rnd.nextInt(3)
      val n = 1 + rnd.nextInt(20000)
      val stream = Seq.fill(n)(rnd.nextLong() % 5000)
      val parts = Array.fill(1 + rnd.nextInt(8))(new KllBuffer(k))
      stream.foreach(v => parts(rnd.nextInt(parts.length)).add(v))
      val order = rnd.shuffle(parts.toSeq)
      val merged = order.head
      order.tail.foreach(merged.mergeIn)
      assert(merged.n == n)
      assert(merged.items.map(_._2).sum == n,
        s"trial $trial: merged weight not conserved")
      checkLedger(merged, stream, s"trial $trial k=$k merged")
    }
  }

  test("serialize/deserialize round-trips state exactly") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = KllSketchAgg(Literal(0L), 16)
    val rnd = new scala.util.Random(19)
    val buf = new KllBuffer(16)
    Seq.fill(5000)(rnd.nextLong() % 1000).foreach(buf.add)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.n == buf.n && back.err == buf.err)
    assert(back.levels.map(_.toSeq) == buf.levels.map(_.toSeq))
    assert(back.coins.toSeq == buf.coins.toSeq)
    // continuing the stream after a round-trip behaves identically
    val more = Seq.fill(2000)(rnd.nextLong() % 1000)
    more.foreach(buf.add)
    more.foreach(back.add)
    assert(back.items.toSeq == buf.items.toSeq)
  }

  test("every summary item is a genuine input value") {
    val rnd = new scala.util.Random(23)
    val stream = Seq.fill(10000)(rnd.nextLong() % 700)
    val inputs = stream.toSet
    val buf = new KllBuffer(32)
    stream.foreach(buf.add)
    buf.items.foreach { case (v, _) =>
      assert(inputs.contains(v), s"summary invented value $v")
    }
  }
}
