package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.10): image/audio/video travel as
  * opaque `binary` columns with typed metadata; per-item decode /
  * feature-extraction runs as partition-wise batch functions.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] is a deterministic fake standing in for e.g.
  * a JPEG decode. Everything around it — the binary schema, the
  * `mapPartitions` batch shape, partition sizing, the metadata contract —
  * is the real production plumbing and is tested. Swapping the stub for a
  * real codec changes one function.
  *
  * Scale notes: media rows are large, so the pipeline keeps them in
  * `binary` columns (never strings), processes partition-wise with
  * constant memory per batch, and carries only extracted features past the
  * decode stage so downstream shuffles never move raw media bytes.
  */
object Multimodal {

  /** One media item: id + raw bytes + declared mime. */
  case class MediaItem(doc_id: Long, media: Array[Byte], mime: String)

  /** Extracted features — what survives past the decode stage. */
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      first_byte: Int,
      checksum: Long,
      n_frames: Long,
      width: Int,
      height: Int)

  /** Attach a binary media column. For the synthetic corpus the "media" is
    * the document text's bytes — stands in for real image/audio payloads. */
  def attachBinary(docs: DataFrame, textCol: String = "text",
      mime: String = "application/octet-stream"): DataFrame =
    docs.withColumn("media", col(textCol).cast("binary"))
      .withColumn("mime", lit(mime))

  /** STUB decode: a deterministic fake "codec" — derives frame count and
    * dimensions from the byte stream instead of a real decoder. Replace the
    * body with an actual codec call (e.g. javax.imageio / ffmpeg) when the
    * libraries exist; the signature is the production contract. */
  def decodeStub(bytes: Array[Byte], frameStride: Int): (Long, Int, Int) = {
    val nFrames = if (bytes.isEmpty) 0L else ((bytes.length - 1) / frameStride + 1).toLong
    val width = 16 + (if (bytes.isEmpty) 0 else bytes(0) & 0x0f)
    val height = 16 + (if (bytes.length > 1) bytes(1) & 0x0f else 0)
    (nFrames, width, height)
  }

  /** Partition-wise feature extraction over binary media. The iterator is
    * consumed lazily — constant memory regardless of partition row count.
    * (Scala analogue of a vectorized mapInPandas decode stage.) */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      frameStride: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          val bytes = Option(it.media).getOrElse(Array.emptyByteArray)
          val (frames, w, h) = decodeStub(bytes, frameStride)
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          MediaFeatures(
            doc_id = it.doc_id,
            byte_len = bytes.length.toLong,
            first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
            checksum = sum,
            n_frames = frames,
            width = w,
            height = h)
        }
      }
  }

  /** Frame sampling: keep every `stride`-th byte as a "frame" payload —
    * the stub analogue of video frame extraction, preserving the
    * one-row-in → many-frames-out generator shape. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      stride: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .flatMap { it =>
        val bytes = Option(it.media).getOrElse(Array.emptyByteArray)
        bytes.indices.by(stride).map { off =>
          (it.doc_id, off / stride, bytes(off) & 0xff)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_byte")
  }
}
