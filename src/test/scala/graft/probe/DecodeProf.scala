package graft.probe
import graft.operators.Multimodal

/** Scratch micro-profiler for the video decode chain (not a Spec). */
object DecodeProf {
  def decodeAll(p: Array[Byte]): Int =
    Multimodal.decodeMp4Samples(p).getOrElse(Seq.empty).count { case (off, sz) =>
      val end = off + sz
      val frame =
        if (off >= 0 && end <= p.length && sz > 0)
          java.util.Arrays.copyOfRange(p, off.toInt, end.toInt)
        else Array.emptyByteArray
      Multimodal.decodeJpegPixels(frame).isDefined
    }
  def main(args: Array[String]): Unit = {
    (0 until 50).foreach { i =>
      decodeAll(Multimodal.syntheticMjpegMp4RichPayload(i.toLong)); () }
    var tSynth = 0L; var tDec = 0L; var n = 0
    (0 until 300).foreach { i =>
      val t0 = System.nanoTime()
      val p = Multimodal.syntheticMjpegMp4RichPayload(i.toLong)
      val t1 = System.nanoTime()
      n += decodeAll(p)
      tSynth += t1 - t0; tDec += System.nanoTime() - t1
    }
    println(s"synth ms/300=${tSynth / 1e6}, decode ms/300=${tDec / 1e6}, frames=$n")
  }
}
