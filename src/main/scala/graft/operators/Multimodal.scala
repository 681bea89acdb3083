package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque bytes + typed metadata (the 100 TB-scale layout for
  * image/audio/video columns — binary payload, no parsing at rest). */
case class MediaRecord(media_id: Long, media: Array[Byte], mime: String)

/** Decoded/extracted features for one media item. */
case class MediaFeatures(media_id: Long, n_bytes: Int, width: Int, height: Int,
                         channels: Int, frame_offsets: Seq[Int])

/** Multimodal-column plumbing — beyond-reference extension.
  *
  * The Spark-side machinery is real and tested: binary columns with typed
  * metadata, partition-parallel batched decoding via `mapPartitions` on a
  * typed `Dataset` (the JVM analogue of `mapInPandas`: the iterator is
  * consumed in fixed-size batches exactly as an inference/decode service
  * would be called), and a deterministic feature schema.
  *
  * DECODE IS A STUB: this container ships no image/audio codecs, so
  * [[decodeStub]] derives features deterministically from the byte content.
  * Swapping in a real decoder = replacing one pure function; every schema,
  * batch, and partitioning decision stays.
  */
object Multimodal {

  /** Deterministic fake decode — clearly-marked stand-in for a codec call. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val width = 64 + n % 512
    val height = 64 + (n * 31) % 512
    (width, height, 3)
  }

  /** Frame sampling stub: every `stride` bytes, up to `maxFrames` offsets —
    * stands in for video keyframe extraction. */
  def sampleFrameOffsets(nBytes: Int, stride: Int = 100, maxFrames: Int = 8): Seq[Int] =
    (0 until math.min(maxFrames, math.max(nBytes, 1) / stride + 1)).map(_ * stride)

  /** Wrap any table into media records: payload column as binary. For the
    * `documents` fixture the text bytes stand in for an image payload. */
  def asMediaRecords(df: DataFrame, idCol: String, payloadCol: String,
                     mime: String = "application/octet-stream")
                    (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      lit(mime).as("mime")).as[MediaRecord]
  }

  /** Batched partition-parallel feature extraction. `batchSize` models the
    * decode-service/vectorized-codec batch shape; partitions process their
    * iterator in groups so memory per task is bounded by one batch. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, c) = decodeStub(r.media)
          MediaFeatures(r.media_id, r.media.length, w, h, c,
            sampleFrameOffsets(r.media.length))
        }
      }
    }
  }

  /** "Resize" stub: recompute metadata for a target box, preserving aspect —
    * pure metadata math standing in for a pixel resample. */
  def resizeFeatures(f: Dataset[MediaFeatures], maxDim: Int)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    f.map { m =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
      m.copy(width = math.max(1, (m.width * scale).toInt),
             height = math.max(1, (m.height * scale).toInt))
    }
  }
}
