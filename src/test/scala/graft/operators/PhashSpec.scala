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

  test("video near-dup: re-encoded twins collide at 10^6, distinct videos don't") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // Crafted corpus: ids 0..19 — frame seeds 0..163, far below the
    // mod-753 frame-pattern period, so no cross-video pattern repeats —
    // plus a RE-ENCODED twin (DC quant 4) for every id % 5 == 0.
    val ids = 0L until 20L
    // the re-encode is a genuinely different byte stream...
    ids.filter(_ % 5 == 0).foreach { id =>
      assert(!java.util.Arrays.equals(
        Multimodal.syntheticMjpegMp4RichPayload(id),
        Multimodal.syntheticMjpegMp4RichPayload(id, quant = 4)),
        s"re-encoded twin of $id must differ byte-wise")
    }
    val media = ids.flatMap { id =>
      val base = (id, Multimodal.syntheticMjpegMp4RichPayload(id))
      if (id % 5 == 0)
        Seq(base, (id + 100L, Multimodal.syntheticMjpegMp4RichPayload(id, quant = 4)))
      else Seq(base)
    }.toDF("doc_id", "payload")
    val frames = Multimodal.videoFrameDecode(media, "doc_id", "payload")
    // ...whose decoded per-frame hashes (BOTH gradient lanes) are
    // bit-identical to the base's
    val byVid = frames.select("media_id", "frame_idx", "dhash", "vhash")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3))).toSeq).toMap
    ids.filter(_ % 5 == 0).foreach { id =>
      assert(byVid(id) == byVid(id + 100L),
        s"twin of $id must decode to identical frame hashes")
    }
    val pairs = Multimodal
      .signatureNearDupPairs2(frames, "media_id", "dhash", "vhash",
        maxHamming = 6)
      .select("idA", "idB", "score_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val twins = ids.filter(_ % 5 == 0).map(id => (id, id + 100L)).toSet
    assert(pairs.map(p => (p._1, p._2)) === twins,
      "exactly the re-encoded twins must surface as near-dup pairs")
    pairs.foreach(p =>
      assert(p._3 == 1000000L, s"full duplicate must score 10^6: $p"))
  }

  test("mp4 box walk: synthetic round-trip, any box order, size encodings") {
    // synthetic round-trip across the arithmetic's period boundaries
    for (id <- Seq(0L, 1L, 2L, 9L, 49L, 499L, 500L, 12345L)) {
      val got = Multimodal.decodeMp4Header(Multimodal.syntheticMp4Payload(id))
      val want = (1000L + (id % 10) * 100, 2000L + (id % 500) * 10,
        (1 + id % 3).toInt)
      assert(got.contains(want), s"id=$id: $got != $want")
    }
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(tpe.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 body (108 - header)
      bb.putInt(0).putInt(0).putInt(0).putInt(90000).putInt(450000)
      bb.array()
    }
    val moov = box("moov", box("mvhd", mvhd) ++ box("trak", Array[Byte]()) ++
      box("trak", Array[Byte]()))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0))
    val mdat = box("mdat", Array.fill[Byte](37)(1))
    // mdat BEFORE moov — the common real-file layout — must still parse
    assert(Multimodal.decodeMp4Header(ftyp ++ mdat ++ moov)
      .contains((90000L, 450000L, 2)))
    // size=0 (box extends to end of file) on the LAST box
    val moovZero = moov.clone(); java.util.Arrays.fill(moovZero, 0, 4, 0.toByte)
    assert(Multimodal.decodeMp4Header(ftyp ++ mdat ++ moovZero)
      .contains((90000L, 450000L, 2)))
    // size=1 + 64-bit largesize on mdat
    val mdatLarge = {
      val body = Array.fill[Byte](21)(2)
      val bb = java.nio.ByteBuffer.allocate(16 + body.length)
      bb.putInt(1).put("mdat".getBytes("US-ASCII"))
        .putLong(16L + body.length).put(body)
      bb.array()
    }
    assert(Multimodal.decodeMp4Header(ftyp ++ mdatLarge ++ moov)
      .contains((90000L, 450000L, 2)))
    // garbage / truncation / no-moov → None, never a throw
    assert(Multimodal.decodeMp4Header("not an mp4 at all".getBytes).isEmpty)
    assert(Multimodal.decodeMp4Header(ftyp ++ mdat).isEmpty)
    assert(Multimodal.decodeMp4Header(
      (ftyp ++ moov).take(ftyp.length + 10)).isEmpty)
  }

  test("mp4 sample tables: per-sample offsets resolve by construction") {
    for (id <- Seq(0L, 1L, 7L, 8L, 63L, 12345L)) {
      val got = Multimodal.decodeMp4Samples(Multimodal.syntheticMp4SamplesPayload(id))
      assert(got.nonEmpty, s"id=$id: sample walk failed")
      val n = (1 + id % 8).toInt
      val sizes = Array.tabulate(n)(k => (1 + (id * 3 + k * 7) % 64).toInt)
      val base = 332L + 4 * n
      val want = sizes.scanLeft(base)(_ + _).zip(sizes).map { case (o, s) => (o, s) }
      assert(got.get == want.toSeq, s"id=$id: ${got.get} != ${want.toSeq}")
      // the resolved offsets must point INSIDE the payload at real bytes
      val payload = Multimodal.syntheticMp4SamplesPayload(id)
      got.get.foreach { case (o, s) =>
        assert(o + s <= payload.length, s"id=$id: sample overruns the file")
      }
    }
    // fixed-size stsz + multi-chunk stco + stsc runs: hand-build a stbl
    // where chunk 1 holds 2 samples and chunks 2+ hold 1 (two stsc runs)
    val bb = java.nio.ByteBuffer.allocate(300)
    bb.putInt(16).put("ftypisom".getBytes("US-ASCII")).putInt(0)
    val stsz = 20; val stco = 8 + 8 + 12; val stsc2 = 8 + 8 + 24
    val stbl = 8 + stsz + stco + stsc2
    val minf = 8 + stbl; val mdia = 8 + minf; val trak = 8 + mdia
    val moov = 8 + trak
    bb.putInt(moov).put("moov".getBytes("US-ASCII"))
    bb.putInt(trak).put("trak".getBytes("US-ASCII"))
    bb.putInt(mdia).put("mdia".getBytes("US-ASCII"))
    bb.putInt(minf).put("minf".getBytes("US-ASCII"))
    bb.putInt(stbl).put("stbl".getBytes("US-ASCII"))
    bb.putInt(stsz).put("stsz".getBytes("US-ASCII"))
      .putInt(0).putInt(10).putInt(4) // fixed size 10, 4 samples
    bb.putInt(stco).put("stco".getBytes("US-ASCII"))
      .putInt(0).putInt(3).putInt(1000).putInt(2000).putInt(3000)
    bb.putInt(stsc2).put("stsc".getBytes("US-ASCII"))
      .putInt(0).putInt(2)
      .putInt(1).putInt(2).putInt(1) // chunk 1: 2 samples
      .putInt(2).putInt(1).putInt(1) // chunks 2+: 1 sample
    val fixture = java.util.Arrays.copyOf(bb.array(), bb.position())
    assert(Multimodal.decodeMp4Samples(fixture)
      .contains(Seq((1000L, 10), (1010L, 10), (2000L, 10), (3000L, 10))))
  }

  test("resize: nearest-neighbor mapping is exact and dimension-correct") {
    // 4x2 source plane with distinct values; upscale to 8x4 and check the
    // floor mapping cell by cell
    val src = Array.tabulate[Byte](8)(i => (i * 10).toByte)
    val out = Multimodal.resizeLuma(src, 4, 2, 8, 4)
    for (y <- 0 until 4; x <- 0 until 8) {
      val want = src((y * 2 / 4) * 4 + (x * 4 / 8)) & 0xff
      assert((out(y * 8 + x) & 0xff) == want, s"($x,$y)")
    }
    // identity resize is the identity
    assert(Multimodal.resizeLuma(src, 4, 2, 4, 2).toSeq == src.toSeq)
  }

  test("audio stats: 16-bit LE samples per the declared header, non-WAV NULLs") {
    import spark.implicits._
    // hand clip, signed 16-bit LE samples 100, -200, 50 (plus a trailing
    // odd byte that must be ignored): sumsq = 10000+40000+2500 = 52500;
    // peak = 200; crossings 100→-200 and -200→50 ⇒ zc = 2
    val header = Multimodal.syntheticWavPayload(0L) // filler 0 → header only
    val hand = header ++ Array[Byte](100, 0, 56, 255.toByte, 50, 0, 9)
    val df = Seq((1L, hand), (2L, "not audio".getBytes)).toDF("id", "payload")
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val got = Multimodal.audioStats(df, "id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    val clip = got(1L)
    assert(clip.getLong(2) == 16L, "declared bits_per_sample must surface")
    assert(clip.getLong(4) == 3L && clip.getLong(5) == 52500L &&
      clip.getLong(6) == 200L && clip.getLong(7) == 2L,
      s"hand clip stats wrong: $clip")
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(5),
      "non-WAV payload must surface NULL stats")
    // synthetic corpus agreement with the 16-bit construction for a few ids
    val ids = Seq(3L, 17L, 99L, 100L)
    val synth = ids.map(i => (i, Multimodal.syntheticWavPayload(i)))
      .toDF("id", "payload")
    val st = Multimodal.audioStats(synth, "id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- ids) {
      val n = (id % 100).toInt
      def v(j: Int): Int = ((id * 7 + j * 13) % 251).toInt
      val amps = (0 until n / 2).map { k =>
        val raw = v(2 * k) + 256 * v(2 * k + 1)
        if (raw >= 32768) raw - 65536 else raw
      }
      val r = st(id)
      assert(r.getLong(4) == (n / 2).toLong)
      assert(r.getLong(5) == amps.map(a => a.toLong * a).sum)
      assert(r.getLong(6) == (if (amps.isEmpty) 0L else amps.map(math.abs).max.toLong))
      assert(r.getLong(7) == amps.zip(amps.drop(1))
        .count { case (a, b) => (a >= 0) != (b >= 0) }.toLong)
    }
  }

  test("png decode: pixel-exact round-trip across all filter types and color types") {
    // the generator cycles filter None/Sub/Up/Average/Paeth by row and the
    // four color types by id — decoded luminance must equal the formula
    // plane EXACTLY for every pixel (this is the fixture the harness
    // oracle generalizes)
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 7L, 50L, 251L, 1000L)) {
      val some = Multimodal.decodePngPixels(Multimodal.syntheticPngPixelPayload(id))
      assert(some.nonEmpty, s"id=$id: real PNG failed to decode")
      val (w, h, plane) = some.get
      assert(w == (16 + id % 17).toInt && h == (16 + (id * 3) % 13).toInt)
      for (i <- 0 until w * h)
        assert((plane(i) & 0xff) == Multimodal.pngExpectedLum(id, i),
          s"id=$id pixel $i: got ${plane(i) & 0xff}, " +
            s"want ${Multimodal.pngExpectedLum(id, i)}")
    }
  }

  test("gif decode: pixel-exact LZW round-trip, formula agreement") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 63L, 64L, 500L, 12345L)) {
      val some = Multimodal.decodeGifPixels(Multimodal.syntheticGifPixelPayload(id))
      assert(some.nonEmpty, s"id=$id: real GIF failed to decode")
      val (w, h, plane) = some.get
      assert(w == (16 + id % 15).toInt && h == (12 + (id * 5) % 11).toInt)
      for (i <- 0 until w * h)
        assert((plane(i) & 0xff) == Multimodal.gifExpectedLum(id, i),
          s"id=$id pixel $i: got ${plane(i) & 0xff}, " +
            s"want ${Multimodal.gifExpectedLum(id, i)}")
    }
  }

  test("gif lzw: general decoder survives repetitive, constant, and large streams") {
    // repetitive data drives compound-code reuse + KwKwK; constant data
    // is the classic KwKwK torture; >2^codeWidth entries force width
    // growth through 8→12 bits; all must round-trip exactly
    def rt(ind: Array[Byte], min: Int): Unit = {
      val enc = Multimodal.lzwEncode(ind, min)
      // round-trip through a minimal synthetic GIF so the public decoder runs
      val w = ind.length; val h = 1
      assert(w <= 0xffff)
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      le16(w); le16(h); out.write(0x80 | 0x07); out.write(0); out.write(0)
      for (j <- 0 until 256) { out.write(j); out.write(j); out.write(j) } // gray palette
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
      out.write(min)
      var off = 0
      while (off < enc.length) {
        val n = math.min(255, enc.length - off)
        out.write(n); out.write(enc, off, n); off += n
      }
      out.write(0); out.write(0x3b)
      val got = Multimodal.decodeGifPixels(out.toByteArray)
      assert(got.nonEmpty, s"decode failed (n=${ind.length}, min=$min)")
      // gray palette → luma601(v,v,v) = v*256>>8 = v: plane == indices
      assert(got.get._3.toSeq == ind.toSeq,
        s"round-trip mismatch (n=${ind.length}, min=$min)")
    }
    rt(Array.fill[Byte](500)(7), 8)                         // constant (KwKwK chain)
    rt(Array.tabulate[Byte](1000)(i => (i % 3).toByte), 2)  // tiny alphabet, repetitive
    rt(Array.tabulate[Byte](6000)(i => (i * 31 % 251).toByte), 8) // width growth to 12 bits
    rt(Array.tabulate[Byte](300)(i => ((i * i + 13) % 256).toByte), 8)
  }

  test("jpeg decode: tile-constant corpus round-trips bit-exactly") {
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 127L, 128L, 250L, 251L, 9999L)) {
      val some = Multimodal.decodeJpegPixels(Multimodal.syntheticJpegPayload(id))
      assert(some.nonEmpty, s"id=$id: real JPEG failed to decode")
      val (w, h, plane) = some.get
      assert(w == (8 * (2 + id % 3)).toInt && h == (8 * (2 + (id * 3) % 3)).toInt)
      for (i <- 0 until w * h)
        assert((plane(i) & 0xff) == Multimodal.jpegExpectedLum(id, i, w),
          s"id=$id pixel $i: got ${plane(i) & 0xff}, " +
            s"want ${Multimodal.jpegExpectedLum(id, i, w)}")
    }
  }

  test("jpeg decode: AC runs + IDCT agree with an independent direct transform") {
    // hand-encode ONE 8x8 block with known coefficients — DC 80 plus two
    // AC terms with a zero-run between them — using a custom AC table, and
    // check the decoded pixels against a from-scratch NAIVE double-sum
    // IDCT (independent of the decoder's separable implementation). This
    // exercises the general entropy path (AC categories, runs, EOB) and
    // the transform itself, which the DC-only corpus cannot.
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int, body: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff); out.write(body)
    }
    out.write(0xff); out.write(0xd8)
    m(0xdb, Array(0.toByte) ++ Array.fill[Byte](64)(1))
    m(0xc0, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    m(0xc4, Array[Byte](0x00, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      Array.tabulate[Byte](12)(_.toByte))
    // AC table: three 2-bit codes 00/01/10 for EOB, (0,5), (2,3)
    m(0xc4, Array[Byte](0x10, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0x00, 0x05, 0x23))
    m(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    // bits: DC cat 7 ("0111") + 80 ("1010000"); AC (0,5)="01" + 30
    // ("11110", category 5 covers magnitudes 16..31); (2,3)="10" +
    // (-7 → "000"); EOB="00"; pad with 1s
    val bits = "0111" + "1010000" + "01" + "11110" + "10" + "000" + "00"
    val padded = bits + "1" * ((8 - bits.length % 8) % 8)
    padded.grouped(8).foreach { g =>
      val v = Integer.parseInt(g, 2)
      out.write(v); if (v == 0xff) out.write(0)
    }
    out.write(0xff); out.write(0xd9)
    val got = Multimodal.decodeJpegPixels(out.toByteArray)
    assert(got.nonEmpty, "hand-built JPEG failed to decode")
    val (w, h, plane) = got.get
    assert(w == 8 && h == 8)
    // coefficients land at zigzag positions 1 → (u=1,v=0) and 4 → (u=1,v=1)
    val f = Array.ofDim[Double](8, 8) // f(v)(u)
    f(0)(0) = 80; f(0)(1) = 30; f(1)(1) = -7
    def c(k: Int) = if (k == 0) 1.0 / math.sqrt(2.0) else 1.0
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c(u) * c(v) * f(v)(u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val want = math.max(0, math.min(255, math.round(s / 4.0).toInt + 128))
      assert((plane(y * 8 + x) & 0xff) == want,
        s"pixel ($x,$y): got ${plane(y * 8 + x) & 0xff}, want $want")
    }
  }

  test("png decode: header-only payloads and junk fall back to None, never throw") {
    // the legacy synthetic payloads carry a raw (non-chunk) tail — the
    // chunk walk must reject them so their stub-luminance hashes persist
    assert(Multimodal.decodePngPixels(Multimodal.syntheticPayload(0L)).isEmpty)
    assert(Multimodal.decodePngPixels(Multimodal.syntheticPayload(3L)).isEmpty)
    assert(Multimodal.decodePngPixels("totally not a png".getBytes).isEmpty)
    assert(Multimodal.decodePngPixels(Array.emptyByteArray).isEmpty)
    // a truncated real PNG (IDAT cut short) must degrade, not throw
    val real = Multimodal.syntheticPngPixelPayload(5L)
    assert(Multimodal.decodePngPixels(real.take(real.length - 20)).isEmpty)
    // and the real payload hashes via the REAL plane — different from the
    // stub path's hash of the same bytes interpreted as a body walk
    assert(Multimodal.dHash63(real) ==
      Multimodal.decodePngPixels(real).map { case (w, h, p) =>
        var hash = 0L
        for (gy <- 0 until 7; gx <- 0 until 9) {
          val py = gy.toLong * h / 7
          val l = p((py * w + gx.toLong * w / 10).toInt) & 0xff
          val r = p((py * w + (gx + 1).toLong * w / 10).toInt) & 0xff
          if (r > l) hash |= 1L << (gy * 9 + gx)
        }
        hash
      }.get)
  }

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

  test("pairQuality: gates, and NULL text is the same verdict as empty") {
    val s = spark; import s.implicits._
    val pairs = Seq(
      (1L, Option("a clean two-word alt"), Option("and a caption here")),
      (2L, Option("x"), Option("too short")),             // 1 word / 2 words
      (3L, Option(""), Option("three caption words")),    // caption saves
      (4L, None: Option[String], None: Option[String]))   // nulls drop
      .toDF("id", "alt", "caption")
    val got = Multimodal.pairQuality(pairs, "alt", "caption")
      .select("id", "alt_ok", "caption_ok", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, true, true, true),
      (2L, false, false, false),
      (3L, false, true, true),
      // a NULL must be a firm false on every verdict, never a vanished
      // row (the decode to Boolean above would throw on null)
      (4L, false, false, false)))
  }

  test("stripPngMetadata: lossless, exact accounting, idempotent, non-PNG") {
    val base = Multimodal.syntheticPngPixelPayload(42L)
    val (w0, h0, p0) = Multimodal.decodePngPixels(base).get
    val author = "Author me".getBytes("US-ASCII")
    val exif = Array.tabulate[Byte](20)(_.toByte)
    val tagged = Multimodal.withPngMetadata(base,
      Seq(("tEXt", author), ("eXIf", exif), ("tIME", Array.fill[Byte](7)(1))))
    assert(tagged.length === base.length + (12 + 9) + (12 + 20) + (12 + 7))
    // decoder skips the planted chunks — tagged still decodes identically
    val (wt, ht, pt) = Multimodal.decodePngPixels(tagged).get
    assert((wt, ht) === ((w0, h0)) && java.util.Arrays.equals(pt, p0))
    val (stripped, n, saved) = Multimodal.stripPngMetadata(tagged)
    assert(n === 3 && saved === (21L + 32L + 19L))
    assert(java.util.Arrays.equals(stripped, base),
      "stripping the planted chunks must restore the original bytes")
    // idempotent on a clean PNG
    val (again, n2, saved2) = Multimodal.stripPngMetadata(stripped)
    assert(n2 === 0 && saved2 === 0L &&
      java.util.Arrays.equals(again, stripped))
    // non-PNG input passes through unchanged
    val junk = "not a png".getBytes("US-ASCII")
    val (same, n3, _) = Multimodal.stripPngMetadata(junk)
    assert(n3 === 0 && java.util.Arrays.equals(same, junk))
  }
}
