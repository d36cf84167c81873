package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.10): image/audio/video travel as
  * opaque `binary` columns with typed metadata; per-item decode /
  * feature-extraction runs as partition-wise batch functions.
  *
  * Image decode/resize is REAL — [[decodeImage]] / [[extractImageFeatures]]
  * / [[resizeImages]] use the JDK's built-in javax.imageio codecs
  * (PNG/JPEG/GIF/BMP), tested against generated PNGs. Audio decode is REAL
  * too — [[decodeAudio]] / [[extractAudioFeatures]] use the JDK's
  * javax.sound.sampled codecs (WAV/AIFF/AU PCM), tested against generated
  * WAVs. Video is REAL as of round 7 for the MJPEG-AVI container —
  * [[decodeAviFrames]] walks the RIFF chunk tree by hand and decodes each
  * frame chunk's JPEG payload through javax.imageio (what webcams/capture
  * cards emit; no ffmpeg-class native codec needed). Only inter-frame
  * codecs (H.264-class) stay out of scope; [[decodeStub]] remains solely
  * as the generic opaque-binary profiler for unknown mimes. The binary
  * schema, `mapPartitions` batch shape, partition sizing, and metadata
  * contract are the production plumbing either way.
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

  /** Opaque-binary profiler for UNKNOWN mimes: derives nominal frame
    * count and dimensions from the byte stream without decoding. Real
    * codecs cover image ([[decodeImage]]), audio ([[decodeAudio]]), GIF
    * ([[decodeGifFrames]]) and MJPEG-AVI video ([[decodeAviFrames]]);
    * this remains only for payloads none of them claim. */
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

  /** Image features from a real decode. */
  case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      mean_luma: Double)

  /** REAL image decode via the JDK's built-in codecs (PNG/JPEG/GIF/BMP —
    * javax.imageio ships with every JVM; no external libraries). Returns
    * None for undecodable bytes. This replaces the stub for image mimes;
    * see [[decodeAudio]] (real, javax.sound) and [[decodeGifFrames]]
    * (real multi-frame GIF); only ffmpeg-class video codecs stay behind
    * [[decodeStub]]. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Partition-wise REAL image feature extraction: decode, dimensions, and
    * mean luminance (ITU-R BT.601 luma over RGB). Undecodable rows yield
    * width=height=-1 — the quarantine contract, not a task failure: one
    * corrupt image must never kill a 100 TB stage. */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          decodeImage(Option(it.media).getOrElse(Array.emptyByteArray)) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var luma = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  luma += 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              ImageFeatures(it.doc_id, w, h, w.toLong * h, luma / math.max(w.toLong * h, 1L))
            case None => ImageFeatures(it.doc_id, -1, -1, 0L, 0.0)
          }
        }
      }
  }

  /** REAL image resize (JDK Graphics2D, bilinear) — returns re-encoded PNG
    * bytes, or the input unchanged if undecodable. The shape to note for
    * scale: resize happens inside the partition iterator, and only the
    * (smaller) resized bytes flow downstream. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      maxDim: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          val bytes = Option(it.media).getOrElse(Array.emptyByteArray)
          val out = decodeImage(bytes) match {
            case Some(img) if math.max(img.getWidth, img.getHeight) > maxDim =>
              val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
              val (nw, nh) = (math.max(1, (img.getWidth * scale).toInt),
                math.max(1, (img.getHeight * scale).toInt))
              val dst = new java.awt.image.BufferedImage(nw, nh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", buf)
              buf.toByteArray
            case _ => bytes
          }
          (it.doc_id, out, "image/png")
        }
      }
      .toDF("doc_id", "media", "mime")
  }

  /** Per-image average-hash row; undecodable rows carry width = -1 and an
    * empty hash (the quarantine contract). */
  case class ImageAHash(doc_id: Long, width: Int, height: Int, ahash: String)

  /** Perceptual average hash (aHash — the classic 64-bit perceptual
    * fingerprint family of pHash/dHash, per Krawetz's canonical
    * description): the image is reduced to an 8×8 grid of mean
    * luminances and each cell compares against the global mean; two
    * images with the same hash are perceptual duplicates regardless of
    * re-encoding, and small edits flip few bits (hamming-robust).
    *
    * EXACT integer form so the hash replays in SQL: integer milli-luma
    * (299·R + 587·G + 114·B) per pixel, grid cell of pixel (x, y) is
    * (y·8 div h, x·8 div w) (floor mapping — any dimensions, no
    * resampling kernel), and the threshold compares cross-multiplied
    * sums — cellSum·nPixels ≥ totalSum·cellPixels — never a float mean.
    * The hash is the 64-char row-major bit string (portable across
    * engines without signed-64-bit gymnastics). Overflow envelope:
    * cellSum·nPixels ≲ 2.6·10⁵·p_cell·p — exact through ~8 MP images;
    * larger inputs go through [[resizeImages]] first. */
  def imageAHash(img: java.awt.image.BufferedImage): String = {
    val w = img.getWidth; val h = img.getHeight
    val bs = new Array[Long](64)
    val bp = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val luma = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        val b = by * 8 + bx
        bs(b) += luma
        bp(b) += 1
        x += 1
      }
      y += 1
    }
    val total = bs.sum
    val n = w.toLong * h
    val sb = new StringBuilder(64)
    var i = 0
    while (i < 64) {
      sb.append(if (bs(i) * n >= total * bp(i)) '1' else '0')
      i += 1
    }
    sb.toString
  }

  /** Partition-wise REAL perceptual hashing: decode + [[imageAHash]] per
    * row; undecodable rows quarantine (width = -1, empty hash) instead of
    * failing the stage. Only the 64-char hash flows downstream — the
    * dedup shuffle never moves image bytes. */
  def extractImageAHashes(spark: SparkSession,
      media: DataFrame): Dataset[ImageAHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          decodeImage(Option(it.media).getOrElse(Array.emptyByteArray)) match {
            case Some(img) =>
              ImageAHash(it.doc_id, img.getWidth, img.getHeight, imageAHash(img))
            case None => ImageAHash(it.doc_id, -1, -1, "")
          }
        }
      }
  }

  /** Per-frame 8×8 block milli-luma signature — the compact per-frame
    * descriptor video ops diff instead of raw pixels (64 longs per
    * frame, not w·h): each block carries floor(Σ luma_milli / pixels)
    * with the same floor-block mapping and 1000-scaled BT.601 luma as
    * [[imageAHash]] — exact integers, so signature-level operators
    * (scene cuts, near-dup frames) replay in any engine. Decode runs
    * inside the partition iterator (the multimodal contract: only the
    * 64-long signature shuffles, never image bytes); undecodable frames
    * quarantine as width = -1 with an empty signature. */
  def extractFrameSignatures(spark: SparkSession,
      frames: DataFrame): DataFrame = {
    import spark.implicits._
    frames.select(col("video_id"), col("frame_idx"), col("media"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { items =>
        items.map { case (vid, f, media) =>
          decodeImage(Option(media).getOrElse(Array.emptyByteArray)) match {
            case Some(img) =>
              val w = img.getWidth; val h = img.getHeight
              val bs = new Array[Long](64)
              val bp = new Array[Long](64)
              var y = 0
              while (y < h) {
                val by = y * 8 / h
                var x = 0
                while (x < w) {
                  val bx = x * 8 / w
                  val rgb = img.getRGB(x, y)
                  val b = by * 8 + bx
                  bs(b) += 299L * ((rgb >> 16) & 0xff) +
                    587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                  bp(b) += 1
                  x += 1
                }
                y += 1
              }
              (vid, f, w, h,
                Array.tabulate(64)(i => if (bp(i) == 0) 0L else bs(i) / bp(i)).toSeq)
            case None => (vid, f, -1, -1, Seq.empty[Long])
          }
        }
      }
      .toDF("video_id", "frame_idx", "width", "height", "blocks")
  }

  /** Scene-cut detection over frame signatures: per video, the mean
    * absolute block-luma change between consecutive frames
    * (Σ|Δblock| div 64, exact milli integers via a frame-ordered lag
    * window PARTITIONED BY video — never global), cut where the change
    * meets `thresholdMilli`. The first frame of every video reports
    * diff 0 / no cut (nothing to differ against). This is the shot-
    * boundary primitive of video curation pipelines (sample one frame
    * per scene instead of every Nth frame).
    *
    * Scale shape: input is the signature relation (64 longs per frame);
    * one per-video window pass. Frame count per video bounds the
    * window partition, not the corpus. */
  def sceneCuts(sigs: DataFrame, thresholdMilli: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("video_id")).orderBy(col("frame_idx"))
    sigs
      .withColumn("__prev", lag(col("blocks"), 1).over(w))
      .withColumn("diff_milli", coalesce(
        expr("""aggregate(zip_with(blocks, __prev,
               |  (a, b) -> abs(a - b)), 0L, (acc, v) -> acc + v) div 64"""
          .stripMargin), lit(0L)))
      .withColumn("is_cut",
        expr(s"CAST(diff_milli >= $thresholdMilli AND __prev IS NOT NULL AS BIGINT)"))
      .select(col("video_id"), col("frame_idx"), col("diff_milli"),
        col("is_cut"))
  }

  /** Scene segmentation + keyframe selection over a [[sceneCuts]]
    * relation: scene_id = running count of cuts up to the frame (an
    * inclusive per-video window sum — a cut frame STARTS its scene),
    * keyframe = each scene's first frame. One frame per scene is the
    * standard sampling contract for video training data (adjacent
    * frames are near-duplicates; scenes are the diversity unit).
    * Output: (video_id, scene_id, keyframe_idx, n_frames) — per-scene,
    * with the scene's frame count so a token-budget step can weight it.
    *
    * Scale shape: two passes over the frame-count-sized cut relation
    * (inclusive cumsum window + (video, scene) combine-agg), both
    * video-partitioned. */
  def sceneKeyframes(cuts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("video_id")).orderBy(col("frame_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cuts
      .withColumn("scene_id", sum(col("is_cut")).over(w))
      .groupBy(col("video_id"), col("scene_id"))
      .agg(min(col("frame_idx")).as("keyframe_idx"),
        count(lit(1)).as("n_frames"))
  }

  /** Deterministic gradient PNG: g = level + x div 4 + y div 3 on all
    * channels — NO modular wrap (callers keep level ≤ 240 so g < 256),
    * so frame-difference arithmetic replays analytically; encoded
    * through the JDK's lossless PNG writer like [[synthPng]]. */
  def synthPngLinear(level: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((level + x / 4 + y / 3) & 0xff).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Gradient (difference) perceptual hash — dHash, [[imageAHash]]'s
    * sibling from the same Krawetz family, robust where aHash is weak
    * (global brightness/contrast shifts cancel out of neighbor
    * differences): the image reduces to a 9×8 grid of integer milli-luma
    * cell sums (floor mapping, any dimensions) and each of the 64 bits
    * compares a cell against its right neighbor — cross-multiplied
    * (sumL·pixR < sumR·pixL), never a float mean. Same 64-char bit
    * string output and overflow envelope as [[imageAHash]]. */
  def imageDHash(img: java.awt.image.BufferedImage): String = {
    val w = img.getWidth; val h = img.getHeight
    val bs = new Array[Long](72)
    val bp = new Array[Long](72)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 9 / w
        val rgb = img.getRGB(x, y)
        val luma = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        val b = by * 9 + bx
        bs(b) += luma
        bp(b) += 1
        x += 1
      }
      y += 1
    }
    val sb = new StringBuilder(64)
    var row = 0
    while (row < 8) {
      var c = 0
      while (c < 8) {
        val l = row * 9 + c
        val r = l + 1
        sb.append(if (bs(l) * bp(r) < bs(r) * bp(l)) '1' else '0')
        c += 1
      }
      row += 1
    }
    sb.toString
  }

  /** Partition-wise [[imageDHash]] extraction — same shape and
    * quarantine contract as [[extractImageAHashes]]. */
  def extractImageDHashes(spark: SparkSession,
      media: DataFrame): Dataset[ImageAHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          decodeImage(Option(it.media).getOrElse(Array.emptyByteArray)) match {
            case Some(img) =>
              ImageAHash(it.doc_id, img.getWidth, img.getHeight, imageDHash(img))
            case None => ImageAHash(it.doc_id, -1, -1, "")
          }
        }
      }
  }

  /** Integer DCT-II basis table for [[imagePHash]]: T(k, n) =
    * round(cos(π·(2n+1)·k/64) · 2¹⁴) over the 32-point transform,
    * computed with StrictMath (bit-identical on every JVM/platform) and
    * emitted LITERALLY into the oracle SQL by [[phashDctTableSql]] —
    * the table IS the contract, so no engine ever evaluates a cosine. */
  lazy val PhashDctTable: Array[Array[Long]] = Array.tabulate(32, 32) {
    (k, n) => math.round(
      StrictMath.cos(StrictMath.PI * (2 * n + 1) * k / 64.0) * 16384.0)
  }

  /** The [[PhashDctTable]] as a SQL VALUES body `(k, n, c), …` for the
    * DuckDB replay (kept adjacent per the T.sql convention). */
  def phashDctTableSql: String =
    (for { k <- 0 until 32; n <- 0 until 32 }
      yield s"($k, $n, ${PhashDctTable(k)(n)})").mkString(", ")

  /** Perceptual DCT hash (pHash, Krawetz's third classic next to
    * [[imageAHash]]/[[imageDHash]] — robust to the global gamma and
    * local-noise edits that flip aHash bits, because it thresholds the
    * image's low-frequency SPECTRUM, not its pixels):
    *
    *  1. the image reduces to a 32×32 matrix of floor-mean integer
    *     milli-lumas (same floor block mapping as aHash — exact, no
    *     resampling kernel);
    *  2. a 2-D integer DCT-II (the [[PhashDctTable]] basis, F = T·P·Tᵀ)
    *     keeps the top-left 8×8 low-frequency block;
    *  3. each of the 63 AC coefficients compares against their integer
    *     MEDIAN (the 32nd smallest — pure comparisons, no float).
    *
    * Every step is exact 64-bit integer arithmetic (envelope: stage-1
    * sums ≤ 32·255000·2¹⁴ ≈ 1.3·10¹¹, stage-2 ≤ 32·that·2¹⁴ ≈ 7·10¹⁶),
    * so the 63-char bit string replays verbatim in SQL from the same
    * table. */
  def imagePHash(img: java.awt.image.BufferedImage): String = {
    val w = img.getWidth; val h = img.getHeight
    val bs = new Array[Long](32 * 32)
    val bp = new Array[Long](32 * 32)
    var y = 0
    while (y < h) {
      val by = y * 32 / h
      var x = 0
      while (x < w) {
        val bx = x * 32 / w
        val rgb = img.getRGB(x, y)
        val luma = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        bs(by * 32 + bx) += luma
        bp(by * 32 + bx) += 1
        x += 1
      }
      y += 1
    }
    val p = Array.tabulate(32, 32)((r, c) =>
      bs(r * 32 + c) / math.max(1L, bp(r * 32 + c)))
    val t = PhashDctTable
    // tmp(u, x) = Σ_y T(u, y) · P(y, x) — only u < 8 feeds the hash
    val tmp = Array.tabulate(8, 32) { (u, x) =>
      var s = 0L; var yy = 0
      while (yy < 32) { s += t(u)(yy) * p(yy)(x); yy += 1 }
      s
    }
    // F(u, v) = Σ_x tmp(u, x) · T(v, x), top-left 8×8
    val f = Array.tabulate(8, 8) { (u, v) =>
      var s = 0L; var xx = 0
      while (xx < 32) { s += tmp(u)(xx) * t(v)(xx); xx += 1 }
      s
    }
    val ac = (for { u <- 0 until 8; v <- 0 until 8; if u != 0 || v != 0 }
      yield f(u)(v)).toArray
    val med = ac.sorted.apply(31) // 32nd smallest of 63
    val sb = new StringBuilder(63)
    ac.foreach(c => sb.append(if (c > med) '1' else '0'))
    sb.toString
  }

  /** Per-image pHash row; undecodable rows quarantine (width = -1,
    * empty hash) — the shared multimodal contract. */
  case class ImagePHash(doc_id: Long, width: Int, height: Int, phash: String)

  /** Partition-wise [[imagePHash]] extraction — same shape and
    * quarantine contract as [[extractImageAHashes]]: only the 63-char
    * hash shuffles, never image bytes. */
  def extractImagePHashes(spark: SparkSession,
      media: DataFrame): Dataset[ImagePHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          decodeImage(Option(it.media).getOrElse(Array.emptyByteArray)) match {
            case Some(img) =>
              ImagePHash(it.doc_id, img.getWidth, img.getHeight, imagePHash(img))
            case None => ImagePHash(it.doc_id, -1, -1, "")
          }
        }
      }
  }

  /** Deterministic grayscale PNG from a seed — the image-path signal
    * generator (pixel (x, y) = (seed·13 + x·31 + y·7) mod 256 on all
    * three channels), encoded through the JDK's own lossless PNG
    * writer so decode returns the exact pattern. */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (((seed * 13 + x.toLong * 31 + y.toLong * 7) % 256L) & 0xff).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Audio features from a real decode. */
  case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      rms: Double)

  /** REAL audio decode via the JDK's built-in javax.sound.sampled codecs
    * (WAV/AIFF/AU PCM ship with every JVM — no external libraries).
    * Returns (format, raw PCM bytes), or None for undecodable input. */
  def decodeAudio(bytes: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val pcm = ais.readAllBytes()
      ais.close()
      Some((fmt, pcm))
    } catch { case _: Exception => None }

  /** Deterministic 16-bit mono PCM WAV from a seed — the test/query signal
    * generator (sample i = ((seed*31 + i*7) mod 65536) - 32768), encoded
    * through the JDK's own WAV writer. */
  def synthWav(seed: Long, nFrames: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = (((seed * 31 + i.toLong * 7) % 65536L) - 32768L).toInt
      data(2 * i) = (v & 0xff).toByte // WAV PCM is little-endian
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Partition-wise REAL audio feature extraction: decode, frame count,
    * duration, RMS amplitude (exact integer sum of squares, one final
    * sqrt). Supports 16-bit (either endianness) and 8-bit PCM; undecodable
    * rows yield sample_rate=-1 — the same quarantine contract as images:
    * one corrupt file must never kill a 100 TB stage. */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          decodeAudio(Option(it.media).getOrElse(Array.emptyByteArray)) match {
            case Some((fmt, pcm)) if fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8 =>
              val bytesPerSample = fmt.getSampleSizeInBits / 8
              val channels = fmt.getChannels
              val frameSize = bytesPerSample * channels
              val nFrames = pcm.length / frameSize
              val nSamples = nFrames.toLong * channels
              var sumSq = 0L
              var i = 0
              while (i + bytesPerSample <= pcm.length) {
                val v =
                  if (bytesPerSample == 1) (pcm(i) & 0xff) - 128
                  else if (fmt.isBigEndian) (pcm(i) << 8) | (pcm(i + 1) & 0xff)
                  else (pcm(i + 1) << 8) | (pcm(i) & 0xff)
                sumSq += v.toLong * v
                i += bytesPerSample
              }
              val rate = fmt.getSampleRate.toInt
              AudioFeatures(it.doc_id, rate, channels, nFrames.toLong,
                nFrames.toLong * 1000L / rate,
                math.sqrt(sumSq.toDouble / math.max(nSamples, 1L)))
            case _ => AudioFeatures(it.doc_id, -1, 0, 0L, 0L, 0.0)
          }
        }
      }
  }

  /** Per-clip audio fingerprint row; undecodable rows carry
    * sample_rate = -1 and an empty print (the quarantine contract). */
  case class AudioPrint(doc_id: Long, sample_rate: Int, n_samples: Long,
      aprint: String)

  /** Energy-profile audio fingerprint — the audio face of
    * [[imageAHash]]'s grid trick (a Shazam-lite signature without the
    * FFT, so it stays in exact integers): the decoded PCM stream maps
    * onto 16 floor-assigned windows (sample i → window i·16 div n — any
    * clip length, no resampling), each window sums |sample|, and the
    * 15-bit print compares each window's MEAN |sample| against its
    * right neighbor cross-multiplied (sumL·cntR < sumR·cntL) — the
    * [[imageDHash]] neighbor-difference form, invariant to uniform gain
    * the way dHash is to brightness. Deterministic for 16-bit and 8-bit
    * PCM of either endianness.
    *
    * Like every perceptual hash here, equal prints group duplicates and
    * hamming distance ranks near-matches; only the 15-char string ever
    * leaves the decode stage. */
  def audioFingerprint(fmt: javax.sound.sampled.AudioFormat,
      pcm: Array[Byte]): String = {
    val bytesPerSample = fmt.getSampleSizeInBits / 8
    val n = pcm.length / bytesPerSample
    if (n < 16) return ""
    val ws = new Array[Long](16)
    val wc = new Array[Long](16)
    var i = 0
    while (i < n) {
      val off = i * bytesPerSample
      val v =
        if (bytesPerSample == 1) (pcm(off) & 0xff) - 128
        else if (fmt.isBigEndian) (pcm(off) << 8) | (pcm(off + 1) & 0xff)
        else (pcm(off + 1) << 8) | (pcm(off) & 0xff)
      val w = (i.toLong * 16 / n).toInt
      ws(w) += math.abs(v.toLong)
      wc(w) += 1
      i += 1
    }
    val sb = new StringBuilder(15)
    var w = 0
    while (w < 15) {
      sb.append(if (ws(w) * wc(w + 1) < ws(w + 1) * wc(w)) '1' else '0')
      w += 1
    }
    sb.toString
  }

  /** Partition-wise REAL audio fingerprinting: decode +
    * [[audioFingerprint]]; undecodable rows quarantine. */
  def extractAudioPrints(spark: SparkSession,
      media: DataFrame): Dataset[AudioPrint] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          decodeAudio(Option(it.media).getOrElse(Array.emptyByteArray)) match {
            case Some((fmt, pcm))
                if fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8 =>
              val n = pcm.length / (fmt.getSampleSizeInBits / 8)
              AudioPrint(it.doc_id, fmt.getSampleRate.toInt, n.toLong,
                audioFingerprint(fmt, pcm))
            case _ => AudioPrint(it.doc_id, -1, 0L, "")
          }
        }
      }
  }

  /** One decoded animation frame's features. */
  case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      mean_luma: Double)

  /** REAL multi-frame decode: animated GIF via the JDK's ImageIO sequence
    * reader — an actual moving-picture container, no external codecs.
    * Returns all frames; empty for undecodable bytes. (ffmpeg-class video
    * codecs remain out of scope for this environment; this provides the
    * real one-file → many-frames path.) */
  def decodeGifFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] =
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return Seq.empty
      val reader = readers.next()
      reader.setInput(in, false)
      val n = reader.getNumImages(true)
      val out = (0 until n).map(i => reader.read(i))
      reader.dispose()
      in.close()
      out
    } catch { case _: Exception => Seq.empty }

  /** Encode frames as an animated GIF through the JDK's own writer (the
    * test/fixture generator for the real decode path). */
  def encodeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Partition-wise REAL frame extraction: one input row fans out to one
    * row per decoded frame (the generator shape of video processing), with
    * per-frame dimensions and mean luma. Undecodable media yields zero
    * rows — generator-shaped quarantine; join back against the id set to
    * list casualties. */
  def extractGifFrames(spark: SparkSession, media: DataFrame): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .flatMap { it =>
        decodeGifFrames(Option(it.media).getOrElse(Array.emptyByteArray))
          .zipWithIndex.map { case (img, idx) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var luma = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                luma += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            FrameFeatures(it.doc_id, idx, w, h, luma / math.max(w.toLong * h, 1L))
          }
      }
  }

  /** ITU-R BT.601 mean luma over all pixels (row-major accumulation —
    * fixed order, deterministic). */
  private def meanLuma(img: java.awt.image.BufferedImage): Double = {
    val (w, h) = (img.getWidth, img.getHeight)
    var luma = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        luma += 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    luma / math.max(w.toLong * h, 1L)
  }

  // ------------- REAL video container: MJPEG-in-AVI (RIFF) -------------
  // Pure-JVM: the container is a hand-rolled RIFF writer/parser and every
  // frame payload is a JPEG handled by javax.imageio — no ffmpeg-class
  // native codecs needed. MJPEG-AVI is a real interchange format (what
  // many webcams/capture cards emit), so the one-file → many-frames video
  // path is now an actual decoder, not decodeStub.

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode frames as an MJPEG AVI through the JDK's JPEG writer (the
    * fixture/test generator for the real decode path — the same role
    * [[synthWav]] and [[encodeGif]] play for audio/GIF). */
  def encodeMjpegAvi(frames: Seq[java.awt.image.BufferedImage],
      fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val jpegs = frames.map { f =>
      // JPEG has no alpha: draw onto an RGB canvas first when needed
      val rgb =
        if (f.getType == java.awt.image.BufferedImage.TYPE_INT_RGB) f
        else {
          val d = new java.awt.image.BufferedImage(f.getWidth, f.getHeight,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = d.createGraphics(); g.drawImage(f, 0, 0, null); g.dispose()
          d
        }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(rgb, "jpg", buf)
      buf.toByteArray
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(typ) ++ body)
    val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
      le32(0) ++ le32(-1) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      fcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length) ++ body
  }

  /** REAL AVI decode: walk the RIFF chunk tree, decode every video frame
    * chunk (`..dc`/`..db` — MJPEG payloads are plain JPEGs) through
    * javax.imageio. Returns all frames in stream order; empty for
    * undecodable/corrupt bytes (quarantine contract). Tolerates truncated
    * files by clamping chunk extents to the buffer. */
  def decodeAviFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] =
    try {
      def fourcc(o: Int) = new String(bytes, o, 4, "US-ASCII")
      def rd32(o: Int): Long =
        ((bytes(o) & 0xffL)) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return Seq.empty
      val out = scala.collection.mutable.ArrayBuffer[java.awt.image.BufferedImage]()
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(off)
          val sz = rd32(off + 4)
          val dataStart = off + 8
          val dataEnd = math.min(dataStart + sz, end.toLong).toInt
          if (dataEnd < dataStart) return
          if (id == "LIST" && dataEnd - dataStart >= 4) walk(dataStart + 4, dataEnd)
          else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")))
            decodeImage(java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd))
              .foreach(out += _)
          off = dataStart + (sz + (sz & 1)).toInt
        }
      }
      walk(12, bytes.length)
      out.toSeq
    } catch { case _: Exception => Seq.empty }

  /** Deterministic MJPEG-AVI from a seed: (2 + seed mod 3) solid-gray
    * frames of (16 + seed mod 8) × (12 + seed mod 5) — dimensions and
    * frame count are formula-derived, so the oracle recomputes them
    * without a decoder (the [[synthWav]] discipline; pixel values go
    * through the lossy JPEG codec and are spec-asserted, not
    * oracle-hashed). */
  def synthMjpegAvi(seed: Long): Array[Byte] = {
    val n = (2 + seed % 3).toInt
    val w = (16 + seed % 8).toInt
    val h = (12 + seed % 5).toInt
    val frames = (0 until n).map { idx =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = ((seed * 37 + idx * 91) % 256).toInt
      val rgb = (v << 16) | (v << 8) | v
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      img
    }
    encodeMjpegAvi(frames)
  }

  /** Partition-wise REAL video frame extraction: one AVI row fans out to
    * one row per decoded frame with dimensions and mean luma — the same
    * generator shape as [[extractGifFrames]], now over an actual video
    * container. Undecodable media yields zero rows (generator-shaped
    * quarantine). */
  def extractVideoFrames(spark: SparkSession, media: DataFrame): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime")).as[MediaItem]
      .flatMap { it =>
        decodeAviFrames(Option(it.media).getOrElse(Array.emptyByteArray))
          .zipWithIndex.map { case (img, idx) =>
            FrameFeatures(it.doc_id, idx, img.getWidth, img.getHeight,
              meanLuma(img))
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
