package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native sketch buffers: random streams, random
  * partitionings, random merge orders — the merged sketch must be
  * BYTE-IDENTICAL to the single-pass sketch (the mergeability contract the
  * harness gates at fixture scale, here exercised over 40 random shapes),
  * and the estimates must respect each sketch's published bounds. Buffer
  * level only — no Spark jobs — so the 40-trial loops run in milliseconds.
  */
class SketchPropsSpec extends AnyFunSuite {

  test("HLL: any partition/merge order ≡ single pass; estimate within 3σ") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 40) {
      val lgK = 8 + rnd.nextInt(5) // 8..12
      val distinct = 1 + rnd.nextInt(20000)
      val stream = Seq.fill(distinct * (1 + rnd.nextInt(3)))(
        rnd.nextInt(distinct).toLong)
      val single = new HllBuffer(lgK)
      stream.foreach(single.add)
      // random partitioning into 1..8 parts, merged in shuffled order
      val parts = Array.fill(1 + rnd.nextInt(8))(new HllBuffer(lgK))
      stream.foreach(v => parts(rnd.nextInt(parts.length)).add(v))
      val order = rnd.shuffle(parts.toSeq)
      val merged = order.head
      order.tail.foreach(merged.mergeIn)
      assert(merged.registers.sameElements(single.registers),
        s"trial $trial lgK=$lgK: merged registers diverge")
      assert(merged.n == single.n)
      val truth = stream.distinct.size.toDouble
      val rse = HllBuffer.rse(lgK)
      assert(math.abs(single.estimate - truth) <= 3 * rse * truth + 2.0,
        s"trial $trial lgK=$lgK: est ${single.estimate} vs true $truth " +
          s"(3σ=${3 * rse * truth})")
    }
  }

  test("CMS: any partition/merge order ≡ single pass; never undercounts") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 40) {
      val depth = 4 + rnd.nextInt(6)
      val width = 256 << rnd.nextInt(3)
      val universe = 1 + rnd.nextInt(3000)
      val stream = Seq.fill(1 + rnd.nextInt(20000))(
        rnd.nextInt(universe).toLong)
      val single = new CmsBuffer(depth, width)
      stream.foreach(single.add)
      val parts = Array.fill(1 + rnd.nextInt(8))(new CmsBuffer(depth, width))
      stream.foreach(v => parts(rnd.nextInt(parts.length)).add(v))
      val order = rnd.shuffle(parts.toSeq)
      val merged = order.head
      order.tail.foreach(merged.mergeIn)
      assert(merged.counters.sameElements(single.counters),
        s"trial $trial $depth x $width: merged counters diverge")
      assert(merged.n == single.n)
      val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      truth.foreach { case (item, cnt) =>
        assert(single.estimate(item) >= cnt,
          s"trial $trial: undercount for $item")
      }
      // aggregate overcount sanity: mean excess per probed item stays under
      // the e·n/width expectation with generous slack (randomized input —
      // per-item bounds are probabilistic, the MEAN concentrates hard)
      val meanExcess = truth.map { case (item, cnt) =>
        (single.estimate(item) - cnt).toDouble
      }.sum / truth.size
      assert(meanExcess <= math.E * stream.size / width + 1.0,
        s"trial $trial: mean excess $meanExcess beyond e*n/w expectation")
    }
  }

  test("HLL/CMS serialization survives arbitrary merge states") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 20) {
      val h = new HllBuffer(4 + rnd.nextInt(9))
      Seq.fill(rnd.nextInt(5000))(rnd.nextLong()).foreach(h.add)
      val h2 = HllBuffer.deserialize(h.serialize())
      assert(h2.lgK == h.lgK && h2.n == h.n &&
        h2.registers.sameElements(h.registers))
      val c = new CmsBuffer(1 + rnd.nextInt(10), 16 + rnd.nextInt(500))
      Seq.fill(rnd.nextInt(5000))(rnd.nextLong()).foreach(c.add)
      val c2 = CmsBuffer.deserialize(c.serialize())
      assert(c2.depth == c.depth && c2.width == c.width && c2.n == c.n &&
        c2.counters.sameElements(c.counters))
    }
  }
}
