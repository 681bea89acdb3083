package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** Perceptual-hash image dedup: dHash63 kernel properties, container
  * offsets, and the banded pair query's EXACT recall at the pigeonhole
  * threshold — on crafted images whose grid cells map 1:1 to body bytes
  * (w=10, h=7 ⇒ sampled luminance (gy, gx) = body[gy·10 + gx]). */
class PhashSpec extends SparkSpec {

  /** Minimal PNG container: real signature + IHDR (so the REAL parse
    * path runs), then `body` as the pixel-data stand-in. */
  private def png(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
    bb.put(0.toByte).put(0.toByte).put(0.toByte).putInt(0)
    bb.array() ++ body
  }

  private val base: Array[Byte] =
    Array.tabulate(70)(i => ((i * 37 + 11) % 251).toByte)

  test("container body offsets: PNG 33, GIF 13, WAV 44, junk 0") {
    assert(Multimodal.containerBodyOffset(Multimodal.syntheticPayload(0L)) === 33)
    assert(Multimodal.containerBodyOffset(Multimodal.syntheticPayload(1L)) === 13)
    assert(Multimodal.containerBodyOffset(Multimodal.syntheticPayload(2L)) === 44)
    assert(Multimodal.containerBodyOffset("not a container".getBytes) === 0)
  }

  test("dHash63: strictly non-negative, zero for header-only, body-sensitive") {
    for (id <- 0L until 300L) {
      val hsh = Multimodal.dHash63(Multimodal.syntheticPayload(id))
      assert(hsh >= 0L, s"id=$id produced a negative hash")
      if (id % 100 == 0) assert(hsh === 0L, s"header-only id=$id must hash to 0")
    }
    // same dims, different body ⇒ different hash (not constant/degenerate)
    val a = Multimodal.dHash63(png(10, 7, base))
    val b = Multimodal.dHash63(png(10, 7, base.map(x => (~x).toByte)))
    assert(a !== b)
  }

  test("one changed pixel moves at most 2 bits; identical images hash equal") {
    val a = Multimodal.dHash63(png(10, 7, base))
    assert(a === Multimodal.dHash63(png(10, 7, base.clone())))
    // flip the luminance of interior grid cell (gy=3, gx=5) only
    val mutated = base.clone()
    mutated(3 * 10 + 5) = ((base(3 * 10 + 5) & 0xff) ^ 0x80).toByte
    val b = Multimodal.dHash63(png(10, 7, mutated))
    val hamming = java.lang.Long.bitCount(a ^ b)
    assert(hamming >= 1 && hamming <= 2, s"expected 1-2 bits, got $hamming")
  }

  test("banded pairs: exact recall vs brute force at the pigeonhole threshold") {
    val s = spark; import s.implicits._
    implicit val sp: SparkSession = s
    val n = 300
    val media = s.range(n.toLong).toDF("doc_id")
    val hashes = Multimodal.withPhash(
      Multimodal.syntheticMediaRecords(media, "doc_id"))
    val got = Multimodal.phashNearDupPairs(hashes, "media_id", "phash", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same kernel values
    val hv = (0L until n.toLong)
      .map(id => id -> Multimodal.dHash63(Multimodal.syntheticPayload(id)))
    val want = (for {
      (ia, ha) <- hv; (ib, hb) <- hv if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia, ib, d.toLong)).toSet
    assert(want.nonEmpty, "fixture produced no close pairs — test is vacuous")
    assert(got === want,
      s"banding must be complete at hamming<=6: missed ${want -- got}, " +
        s"invented ${got -- want}")
  }

  test("crafted near-dup found, far image not paired with it") {
    val s = spark; import s.implicits._
    implicit val sp: SparkSession = s
    val mutated = base.clone()
    mutated(3 * 10 + 5) = ((base(3 * 10 + 5) & 0xff) ^ 0x80).toByte
    val recs = Seq(
      MediaRecord(1L, png(10, 7, base), "image/png"),
      MediaRecord(2L, png(10, 7, mutated), "image/png"),
      MediaRecord(3L, png(10, 7, base.map(x => (~x).toByte)), "image/png"))
      .toDS()
    val pairs = Multimodal.phashNearDupPairs(
      Multimodal.withPhash(recs), "media_id", "phash", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the one-pixel variant must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the inverted image must not pair with anything")
  }
}
