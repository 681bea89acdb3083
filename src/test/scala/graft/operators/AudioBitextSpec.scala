package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Audio fingerprint near-dup + bitext margin mining: the kernel
  * properties the oracles can't isolate — gain invariance at the byte
  * level, perturbation bit-locality, degenerate-payload behavior, and
  * the margin math's hub-cancelling / reject contracts. */
class AudioBitextSpec extends SparkSpec {

  test("audio fingerprints: x2-gain twin has different bytes, identical signatures") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val ids = (0L until 12L).toSeq
    val media = ids.flatMap { id =>
      Seq((id, Multimodal.syntheticAudioNearDupPayload(id, 1, perturbed = false)),
          (id + 1000L, Multimodal.syntheticAudioNearDupPayload(id, 2, perturbed = false)))
    }
    // every non-silent sample byte changes under gain, the fingerprint never
    media.foreach { case (mid, p) =>
      if (mid >= 1000L) {
        val base = Multimodal.syntheticAudioNearDupPayload(mid - 1000L, 1, perturbed = false)
        assert(!java.util.Arrays.equals(base, p), s"twin payload identical for $mid")
      }
    }
    val fps = Multimodal.audioFingerprints(
        media.toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    ids.foreach { id =>
      val segs = fps.keys.filter(_._1 == id).map(_._2)
      assert(segs.nonEmpty, s"no segments for $id")
      segs.foreach { sIdx =>
        assert(fps((id, sIdx)) == fps((id + 1000L, sIdx)),
          s"gain changed fingerprint for ($id, $sIdx)")
      }
    }
  }

  test("audio fingerprints: perturbed twin flips at most 2 bits per segment") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val ids = (0L until 24L).toSeq
    val media = ids.flatMap { id =>
      Seq((id, Multimodal.syntheticAudioNearDupPayload(id, 1, perturbed = false)),
          (id + 1000L, Multimodal.syntheticAudioNearDupPayload(id, 1, perturbed = true)))
    }
    val fps = Multimodal.audioFingerprints(
        media.toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    var flippedSomewhere = false
    ids.foreach { id =>
      fps.keys.filter(_._1 == id).map(_._2).foreach { sIdx =>
        val (lo, hi) = fps((id, sIdx))
        val (lo2, hi2) = fps((id + 1000L, sIdx))
        // <= 2 adjacent-delta bits + <= 2 skip-delta bits around the
        // nudged frame — inside the hamming-6 matcher budget
        val d = java.lang.Long.bitCount(lo ^ lo2) +
          java.lang.Long.bitCount(hi ^ hi2)
        assert(d <= 4, s"perturbation flipped $d bits at ($id, $sIdx)")
        if (d > 0) flippedSomewhere = true
      }
    }
    // the nudge must actually bite somewhere, or the near-dup corpus's
    // hamming-1..6 regime is vacuous
    assert(flippedSomewhere, "perturbation never flipped a bit")
  }

  test("audio fingerprints: non-WAV, 8-bit, and short payloads yield no rows") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),                       // not RIFF
      (2L, Multimodal.syntheticWavPayload(7L)),          // 16-bit but < 1 segment
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.audioFingerprints(
      junk.toDF("doc_id", "payload"), "doc_id", "payload")
    assert(out.count() == 0L)
  }

  test("audio banded pairs: gain twins score 10^6 through the full matcher") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val ids = (0L until 10L).toSeq
    val media = ids.map(id =>
      (id, Multimodal.syntheticAudioNearDupPayload(id, 1, perturbed = false))) ++
      ids.filter(_ % 5 == 0).map(id =>
        (id + 100L, Multimodal.syntheticAudioNearDupPayload(id, 2, perturbed = false)))
    val fps = Multimodal.audioFingerprints(
      media.toDF("doc_id", "payload"), "doc_id", "payload")
    val pairs = Multimodal.signatureNearDupPairs2(fps, "media_id", "fp", "fp2", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(6)).toMap
    ids.filter(_ % 5 == 0).foreach { id =>
      assert(pairs.get((id, id + 100L)).contains(1000000L),
        s"gain twin of $id did not score 10^6: ${pairs.get((id, id + 100L))}")
    }
  }

  test("audio banded pairs: remixed twin scores partial overlap, strangers zero") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val ids = (0L until 12L).toSeq
    val media = ids.map(id =>
      (id, Multimodal.syntheticAudioNearDupPayload(id, 1, perturbed = false))) ++
      ids.map(id =>
        (id + 100L, Multimodal.syntheticAudioNearDupPayload(id, 1,
          perturbed = false, remixed = true)))
    val fps = Multimodal.audioFingerprints(
      media.toDF("doc_id", "payload"), "doc_id", "payload")
    val pairs = Multimodal.signatureNearDupPairs2(fps, "media_id", "fp", "fp2", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(6)).toMap
    ids.foreach { id =>
      val sc = pairs.get((id, id + 100L))
      // even segments shared, odd segments fresh: ceil(n/2) of n match
      // on each side -> score in [500000, 667000] depending on n (3..6)
      assert(sc.exists(v => v >= 500000L && v <= 667000L),
        s"remix twin of $id scored $sc")
    }
    // distinct base clips share no segment seeds in the widened space —
    // no cross-clip pair may reach even half overlap
    ids.combinations(2).foreach { case Seq(a, b) =>
      assert(!pairs.get((a, b)).exists(_ >= 500000L),
        s"strangers $a,$b scored ${pairs.get((a, b))}")
    }
  }

  test("bitext margin: true pair wins, hub is punished, junk rejected") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // corpus: 0 ≈ src 0 (true pair), 1 orthogonal-ish, 2 a hub vector
    // close to EVERYTHING (high raw cosine, but its k-NN average is also
    // high, so its margin stays low), 3 anti-correlated with src 10
    val tgt = Seq(
      (0L, Array(1.0f, 0.0f, 0.1f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.1f)),
      (2L, Array(0.6f, 0.6f, 0.6f, 0.6f)),
      (3L, Array(-1.0f, -0.2f, 0.0f, 0.0f)),
      (4L, Array(0.1f, 0.9f, 0.2f, 0.0f))
    ).toDF("vec_id", "embedding")
    val src = Seq(
      (0L, Array(0.95f, 0.05f, 0.1f, 0.0f)),   // near tgt 0
      (10L, Array(1.0f, 0.2f, 0.0f, 0.0f))     // near tgt 0 too
    ).toDF("vec_id", "embedding")
    val out = Similarity.bitextMine(src, tgt, k = 2, minMarginPpm = 1050000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4))).toMap
    assert(out(0L)._1 == 0L, s"src 0 should mine tgt 0, got ${out(0L)}")
    assert(out(0L)._3.exists(_ >= 1000000L), "true pair margin below 1.0")
    // every mined tgt must not be the hub: its close-to-everything
    // geometry keeps its margin below the distinctive matches
    out.values.foreach { case (tgtId, _, _, _) => assert(tgtId != 2L) }
  }

  test("bitext margin: negative best cosine yields NULL margin, never accepted") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val tgt = Seq((0L, Array(-1.0f, 0.0f)), (1L, Array(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val src = Seq((5L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.bitextMine(src, tgt, k = 2, minMarginPpm = 1050000L)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.isNullAt(3), "margin should be NULL for negative cosine")
    assert(!rows.head.getBoolean(4), "negative-cosine pair must not be accepted")
  }
}
