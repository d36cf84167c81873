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

  test("real WAV decode: features match the synthesized signal") {
    import spark.implicits._
    val media = Seq(7L, 13L).toDS().mapPartitions(_.map(id =>
      (id, Multimodal.synthWav(id, 120, 8000f), "audio/wav")))
      .toDF("doc_id", "media", "mime")
    val got = Multimodal.extractAudioFeatures(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    got.foreach { case (id, f) =>
      assert(f.sample_rate == 8000 && f.channels == 1 && f.n_frames == 120)
      assert(f.duration_ms == 15) // 120 frames / 8 kHz
      // exact RMS from the generator formula
      val sumSq = (0 until 120).map { i =>
        val v = ((id * 31 + i.toLong * 7) % 65536L) - 32768L
        v * v
      }.sum
      assert(math.abs(f.rms - math.sqrt(sumSq.toDouble / 120)) < 1e-9,
        s"rms mismatch for $id")
    }
  }

  test("real animated-GIF decode: one row per frame with real pixel stats") {
    import spark.implicits._
    def gray(level: Int, w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(level, level, level))
      g.fillRect(0, 0, w, h); g.dispose()
      img
    }
    val gif = Multimodal.encodeGif(Seq(gray(0, 8, 6), gray(128, 8, 6), gray(255, 8, 6)))
    val media = Seq((1L, gif, "image/gif"), (2L, "junk".getBytes, "image/gif"))
      .toDF("doc_id", "media", "mime")
    val got = Multimodal.extractGifFrames(spark, media).collect()
      .sortBy(f => (f.doc_id, f.frame_idx))
    assert(got.length == 3, "3 frames from doc 1, zero from corrupt doc 2")
    assert(got.forall(f => f.doc_id == 1L && f.width == 8 && f.height == 6))
    // GIF palettes quantize, but black < mid-gray < white must survive
    assert(got(0).mean_luma < 1.0)
    assert(got(1).mean_luma > got(0).mean_luma && got(2).mean_luma > got(1).mean_luma)
    assert(got(2).mean_luma > 250.0)
  }

  test("real MJPEG-AVI decode: RIFF round-trip, per-frame rows, real pixels") {
    import spark.implicits._
    def gray(level: Int, w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(level, level, level))
      g.fillRect(0, 0, w, h); g.dispose()
      img
    }
    val avi = Multimodal.encodeMjpegAvi(Seq(gray(10, 20, 14), gray(240, 20, 14)))
    // container sanity: it IS an AVI
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val media = Seq(
      (1L, avi, "video/x-msvideo"),
      (2L, "definitely not an avi".getBytes, "video/x-msvideo"),
      (3L, avi.take(40), "video/x-msvideo")) // truncated mid-header
      .toDF("doc_id", "media", "mime")
    val got = Multimodal.extractVideoFrames(spark, media).collect()
      .sortBy(f => (f.doc_id, f.frame_idx))
    // 2 frames from doc 1; corrupt + truncated docs quarantine to 0 rows
    assert(got.length == 2 && got.forall(_.doc_id == 1L))
    assert(got.forall(f => f.width == 20 && f.height == 14))
    // JPEG is lossy but dark vs bright must survive the codec
    assert(got(0).mean_luma < 60.0 && got(1).mean_luma > 200.0)
  }

  test("synthMjpegAvi geometry matches its formula (the oracle contract)") {
    for (seed <- 0L to 12L) {
      val frames = Multimodal.decodeAviFrames(Multimodal.synthMjpegAvi(seed))
      assert(frames.length == (2 + seed % 3).toInt, s"frame count for $seed")
      assert(frames.forall(_.getWidth == (16 + seed % 8).toInt), s"width for $seed")
      assert(frames.forall(_.getHeight == (12 + seed % 5).toInt), s"height for $seed")
    }
  }

  test("corrupt audio bytes quarantine instead of failing the task") {
    import spark.implicits._
    val wav = Multimodal.synthWav(1L, 50)
    val media = Seq(
      (1L, wav, "audio/wav"),
      (2L, "not a wav file at all".getBytes, "audio/wav"),
      (3L, wav.take(10), "audio/wav")) // truncated header
      .toDF("doc_id", "media", "mime")
    val got = Multimodal.extractAudioFeatures(spark, media)
      .collect().map(f => f.doc_id -> f.sample_rate).toMap
    assert(got(1L) == 8000 && got(2L) == -1 && got(3L) == -1)
  }

  test("aHash: codec-invariant, edit-robust, pattern-sensitive, quarantined") {
    import spark.implicits._
    // same pattern through the lossless codec -> identical 64-bit hash
    val a = Multimodal.decodeImage(Multimodal.synthPng(7L, 32, 24)).get
    val b = Multimodal.decodeImage(Multimodal.synthPng(7L, 32, 24)).get
    val ha = Multimodal.imageAHash(a)
    assert(ha.length == 64 && ha.forall(c => c == '0' || c == '1'))
    assert(ha == Multimodal.imageAHash(b))
    // a one-pixel edit flips at most a couple of bits (hamming-robust)
    val edited = Multimodal.decodeImage(Multimodal.synthPng(7L, 32, 24)).get
    edited.setRGB(3, 3, 0xffffff)
    val hamming = ha.zip(Multimodal.imageAHash(edited)).count(p => p._1 != p._2)
    assert(hamming <= 4, s"one-pixel edit moved $hamming bits")
    // a different pattern lands above the one-pixel-edit envelope
    // (adjacent gradient seeds stay fairly close — 7 bits here)
    val hc = Multimodal.imageAHash(
      Multimodal.decodeImage(Multimodal.synthPng(8L, 32, 24)).get)
    assert(ha.zip(hc).count(p => p._1 != p._2) > 4)
    // undecodable bytes quarantine with width=-1 and an empty hash
    val media = Seq(
      (1L, Multimodal.synthPng(1L, 16, 16), "image/png"),
      (2L, "not an image".getBytes, "image/png"))
      .toDF("doc_id", "media", "mime")
    val rows = Multimodal.extractImageAHashes(spark, media)
      .collect().map(r => r.doc_id -> ((r.width, r.ahash.length))).toMap
    assert(rows(1L) == ((16, 64)) && rows(2L) == ((-1, 0)))
  }

  test("audio fingerprint: codec round-trip stable, gain-invariant, quarantined") {
    import spark.implicits._
    def pcmLE(samples: Array[Int]): Array[Byte] = {
      val out = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        out(2 * i) = (samples(i) & 0xff).toByte
        out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      out
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val sig = Array.tabulate(160)(i => (math.sin(i / 7.0) * 900).toInt)
    val p0 = Multimodal.audioFingerprint(fmt, pcmLE(sig))
    assert(p0.length == 15 && p0.forall(c => c == '0' || c == '1'))
    // uniform 2x gain scales every window sum equally -> identical print
    assert(p0 == Multimodal.audioFingerprint(fmt, pcmLE(sig.map(_ * 2))))
    // a different signal shape prints differently
    val other = Array.tabulate(160)(i => (math.sin(i / 2.0) * 900).toInt)
    assert(p0 != Multimodal.audioFingerprint(fmt, pcmLE(other)))
    // the real WAV round-trip is stable: same seed -> same print
    val media = Seq(
      (1L, Multimodal.synthWav(5L, 345), "audio/wav"),
      (2L, Multimodal.synthWav(5L, 345), "audio/wav"),
      (3L, "not audio".getBytes, "audio/wav"))
      .toDF("doc_id", "media", "mime")
    val rows = Multimodal.extractAudioPrints(spark, media)
      .collect().map(r => r.doc_id -> ((r.sample_rate, r.aprint))).toMap
    assert(rows(1L)._2 == rows(2L)._2 && rows(1L)._2.length == 15)
    assert(rows(3L) == ((-1, "")))
  }

  test("dHash: brightness-shift invariant where aHash is not required to be") {
    def gradImg(offset: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) {
        val g = ((x * 5 + y * 3) % 180) + offset // stays in [0, 255]
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val h0 = Multimodal.imageDHash(gradImg(0))
    assert(h0.length == 64 && h0.forall(c => c == '0' || c == '1'))
    // a uniform +60 brightness shift leaves every neighbor DIFFERENCE
    // intact -> identical dHash (the property aHash lacks)
    assert(h0 == Multimodal.imageDHash(gradImg(60)))
    // different content is far apart
    val flat = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val hFlat = Multimodal.imageDHash(flat)
    assert(h0 != hFlat)
  }

  test("scene cuts: boundaries detected exactly, corrupt frame quarantines") {
    import spark.implicits._
    // one video, 10 frames, scenes of 4 (level jumps at frames 4 and 8)
    val frames = (0 until 10).map { f =>
      (1L, f, Multimodal.synthPngLinear((f / 4) * 80L + (f % 4) * 2L, 32, 24))
    }.toDF("video_id", "frame_idx", "media")
    val sigs = Multimodal.extractFrameSignatures(spark, frames)
    val cuts = Multimodal.sceneCuts(sigs, thresholdMilli = 20000L)
      .collect().map(r => r.getAs[Int]("frame_idx") ->
        (r.getAs[Long]("diff_milli"), r.getAs[Long]("is_cut"))).toMap
    assert(cuts(0) == ((0L, 0L))) // first frame: nothing to differ against
    assert(cuts.filter(_._2._2 == 1L).keySet == Set(4, 8), cuts)
    // within-scene drift is exactly the 2-level luma step (gradient cancels)
    assert(cuts(1)._1 == 2000L && cuts(5)._1 == 2000L, cuts)
    // scene jump: 80 - 6 = 74 levels
    assert(cuts(4)._1 == 74000L, cuts)
    // corrupt bytes quarantine as width = -1, empty signature
    val bad = Seq((2L, 0, Array[Byte](1, 2, 3))).toDF("video_id", "frame_idx", "media")
    val q = Multimodal.extractFrameSignatures(spark, bad).collect().head
    assert(q.getAs[Int]("width") == -1 &&
      q.getAs[scala.collection.Seq[Long]]("blocks").isEmpty)
    // keyframes: one per scene, scene sizes 4/4/2
    val kf = Multimodal.sceneKeyframes(
        Multimodal.sceneCuts(sigs, thresholdMilli = 20000L))
      .collect().map(r => r.getAs[Long]("scene_id") ->
        (r.getAs[Int]("keyframe_idx"), r.getAs[Long]("n_frames"))).toMap
    assert(kf == Map(0L -> ((0, 4L)), 1L -> ((4, 4L)), 2L -> ((8, 2L))), kf)
  }

  test("pHash: 63 bits, decode-roundtrip-stable, brightness/contrast-invariant") {
    // 32×32 so the block grid is fully populated (identity mapping):
    // the brightness argument below needs a constant added to EVERY
    // cell of P, which smaller heights break (empty grid rows stay 0)
    def gray(f: (Int, Int) => Int, w: Int = 32, h: Int = 32) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val base = gray((x, y) => (x * 5 + y * 3) % 100)
    val h0 = Multimodal.imagePHash(base)
    assert(h0.length == 63 && h0.forall(c => c == '0' || c == '1'))
    // PNG is lossless: encode → decode reproduces the hash exactly
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(base, "png", buf)
    val rt = Multimodal.decodeImage(buf.toByteArray).get
    assert(Multimodal.imagePHash(rt) == h0)
    // +50 brightness (no clipping: values < 150) shifts ONLY the DC
    // coefficient — the 63 AC bits are untouched
    assert(Multimodal.imagePHash(gray((x, y) => (x * 5 + y * 3) % 100 + 50)) == h0)
    // exact 2x contrast scales every AC coefficient by the same positive
    // factor — median comparisons are scale-invariant
    assert(Multimodal.imagePHash(gray((x, y) => ((x * 5 + y * 3) % 100) * 2)) == h0)
    // a genuinely different image hashes differently
    assert(Multimodal.imagePHash(gray((x, y) => (x * x + 7 * y) % 256)) != h0)
  }

  test("pHash extraction: planted duplicates cluster; garbage quarantines") {
    import spark.implicits._
    val media = (0L until 12L).map(i =>
        (i, Multimodal.synthPng(i % 4, 32, 24), "image/png"))
      .toDF("doc_id", "media", "mime")
    val hashed = Multimodal.extractImagePHashes(spark, media).collect()
    assert(hashed.forall(_.phash.length == 63))
    // seed = doc_id % 4 plants exact perceptual duplicates
    assert(hashed.groupBy(_.phash).size == 4)
    val bad = Seq((99L, Array[Byte](1, 2, 3), "image/png"))
      .toDF("doc_id", "media", "mime")
    val q = Multimodal.extractImagePHashes(spark, bad).collect().head
    assert(q.width == -1 && q.phash == "")
  }
}
