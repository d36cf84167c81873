package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("binary attach: schema carries BinaryType media + mime metadata") {
    val m = Multimodal.attachBinary(docs(1L -> "abc"), mime = "image/fake")
    assert(m.schema("media").dataType == org.apache.spark.sql.types.BinaryType)
    assert(m.head().getAs[String]("mime") == "image/fake")
  }

  test("feature extraction over bytes via mapPartitions") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.attachBinary(docs(1L -> "abcd", 2L -> ""))).collect()
    val f1 = feats.find(_.doc_id == 1L).get
    assert(f1.byte_len == 4L)
    assert(f1.first_byte == 'a'.toInt)
    assert(f1.checksum == "abcd".map(_.toLong).sum)
    assert(f1.n_frames == 1L)
    assert(f1.width == 16 + ('a' & 0x0f) && f1.height == 16 + ('b' & 0x0f))
    val f2 = feats.find(_.doc_id == 2L).get
    assert(f2.byte_len == 0L && f2.first_byte == -1 && f2.n_frames == 0L)
  }

  test("frame sampling: one row per stride offset (generator shape)") {
    val frames = Multimodal.sampleFrames(spark,
      Multimodal.attachBinary(docs(1L -> ("x" * 40))), stride = 16)
      .collect()
    assert(frames.length == 3) // offsets 0, 16, 32
    assert(frames.map(_.getAs[Int]("frame_idx")).toSet == Set(0, 1, 2))
    assert(frames.forall(_.getAs[Int]("frame_byte") == 'x'.toInt))
  }

  test("features survive a shuffle without carrying media bytes") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.attachBinary(docs((1L to 20L).map(i => i -> s"text number $i"): _*)))
    // aggregating features is fine — media column is gone by this stage
    assert(!feats.columns.contains("media"))
    val agg = feats.groupBy().agg(sum("byte_len")).head().getLong(0)
    assert(agg > 0)
  }

  /** Deterministic PNG: w x h gradient keyed by doc_id. */
  def png(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x + y + docId) % 256).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("real PNG decode: dimensions and luminance from actual pixels") {
    import spark.implicits._
    val media = Seq((1L, png(1L, 32, 16), "image/png"),
      (2L, png(2L, 8, 8), "image/png"),
      (3L, "not an image".getBytes, "image/png"))
      .toDF("doc_id", "media", "mime")
    val feats = Multimodal.extractImageFeatures(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).width == 32 && feats(1L).height == 16 && feats(1L).n_pixels == 512)
    assert(feats(2L).width == 8 && feats(2L).height == 8)
    // gray gradient: luma == pixel value mean; exact value computable
    val expect2 = (for (y <- 0 until 8; x <- 0 until 8) yield ((x + y + 2L) % 256).toDouble).sum / 64
    assert(math.abs(feats(2L).mean_luma - expect2) < 1e-9)
    // corrupt bytes quarantine, not crash
    assert(feats(3L).width == -1 && feats(3L).n_pixels == 0L)
  }

  test("real resize caps the max dimension and re-encodes as decodable PNG") {
    import spark.implicits._
    val media = Seq((1L, png(1L, 64, 32), "image/png"),
      (2L, png(2L, 10, 10), "image/png")).toDF("doc_id", "media", "mime")
    val out = Multimodal.resizeImages(spark, media, maxDim = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val r1 = Multimodal.decodeImage(out(1L)).get
    assert(r1.getWidth == 16 && r1.getHeight == 8)
    // small images pass through untouched
    val r2 = Multimodal.decodeImage(out(2L)).get
    assert(r2.getWidth == 10 && r2.getHeight == 10)
  }
}
