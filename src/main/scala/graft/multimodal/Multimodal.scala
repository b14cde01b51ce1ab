package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns next to typed metadata, and
  * decode/feature/resize/frame-sample run as partition-batched functions
  * over the binary bytes — the Scala/JVM analogue of a Pandas-batched UDF
  * (`Dataset.mapPartitions` gives the same batch shape: an iterator of
  * rows per partition, vectorizable inside the lambda).
  *
  * Image (PNG/JPEG/BMP via `javax.imageio`), audio (WAV via
  * `javax.sound.sampled`) AND video (RIFF/AVI via the pure-JVM [[Avi]]
  * demuxer — raw-DIB frames unpacked directly, MJPEG frames through the
  * JDK JPEG codec) decode are all REAL, zero extra jars. The byte-range
  * chunker [[sampleFrames]] stays as the kind-agnostic grain primitive
  * (q53); container-aware video lives in [[Avi]] (q207).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (SURVEY §1.3 maps the
    * reference's nested-struct stance onto binary payloads).
    */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      width: Int, height: Int, sample_rate: Int,
                      duration_ms: Int, format: String)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  /** Decoded image facts: dimensions plus exact per-channel pixel sums —
    * integer-exact, so an oracle that knows how a fixture image was
    * generated can reproduce every column without a codec.
    */
  case class ImageMeta(media_id: Long, width: Int, height: Int,
                       n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decoded audio facts: container header (rate, frame count) plus the
    * exact sum of 16-bit samples — same oracle-reproducibility contract.
    */
  case class AudioMeta(media_id: Long, sample_rate: Int, n_frames: Long,
                       sum_samples: Long)

  /** 8×8 average-hash of a decoded image — integer-exact, so the bit
    * pattern is oracle-reproducible from a fixture's generation formula.
    */
  case class ImageHash(media_id: Long, width: Int, height: Int,
                       ahash: Long, n_set_bits: Long)

  /** Per-frame audio features from real decode: exact energy (sum of
    * squared 16-bit samples) and zero-crossing count.
    */
  case class AudioFrame(media_id: Long, frame_idx: Long, n_samples: Long,
                        energy: Long, n_crossings: Long)

  /** Binary tables need byte-aware partitioning: a parquet split sized for
    * row counts puts gigabytes of payload in one task. Repartition to a
    * target payload volume per partition before the decode pass.
    */
  def repartitionByPayload(df: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val total = df.agg(sum(length(col("bytes")))).head()
    val totalBytes = if (total.isNullAt(0)) 0L else total.getLong(0)
    val target = math.max(1L, targetBytesPerPartition)
    val parts = math.max(1L,
      math.min(200000L, (totalBytes + target - 1) / target)).toInt
    df.repartition(parts)
  }

  // ---- image codec (javax.imageio — real decode, JDK-only) ----

  /** Decode any ImageIO-supported payload (PNG/JPEG/BMP/GIF) and fold the
    * pixels once. `setUseCache(false)` keeps ImageIO off temp files — the
    * payload is already in memory.
    */
  private[multimodal] def imageStats(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    ImageIO.setUseCache(false)
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** Partition-batched image decode: real pixels, exact channel sums. */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { r =>
      val (w, h, sr, sg, sb) = imageStats(r.bytes)
      ImageMeta(r.media_id, w, h, w.toLong * h, sr, sg, sb)
    })
  }

  /** Real resize: decode, rescale through Graphics2D, re-encode as PNG. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { r =>
      ImageIO.setUseCache(false)
      val src = ImageIO.read(new ByteArrayInputStream(r.bytes))
      require(src != null, s"media_id=${r.media_id}: undecodable image payload")
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      r.copy(bytes = bos.toByteArray, width = w, height = h, format = "png")
    })
  }

  /** Deterministic two-color checkerboard PNG (fixtures + oracle gates):
    * pixel (x,y) gets color1 when (x+y) is even, else color2, with both
    * colors derived from `id` by modular arithmetic an engine without a
    * codec can reproduce — see the q63 oracle.
    */
  def checkerboardPng(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad image dims ${w}x$h")
    ImageIO.setUseCache(false)
    def m(k: Long) = ((id * k) % 256).toInt
    val c1 = (m(7) << 16) | (m(11) << 8) | m(13)
    val c2 = (m(17) << 16) | (m(19) << 8) | m(23)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (((x + y) & 1) == 0) c1 else c2)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- audio codec (javax.sound.sampled — real decode, JDK-only) ----

  /** Encode 16-bit mono little-endian PCM samples as a WAV container. */
  def pcm16Wav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos) finally ais.close()
    bos.toByteArray
  }

  /** Deterministic WAV fixture for `id`: 64 + (id mod 64) samples at 8 kHz,
    * sample i = ((id·31 + i·7) mod 2003) − 1001 — closed-form arithmetic
    * the q65 oracle reproduces without an audio library.
    */
  def toneWav(id: Long): Array[Byte] = {
    val n = 64 + (id % 64).toInt
    pcm16Wav(Array.tabulate(n)(i =>
      (((id * 31 + i * 7) % 2003) - 1001).toShort), 8000)
  }

  private[multimodal] def wavStats(bytes: Array[Byte]): (Int, Long, Long) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian,
        s"expected 16-bit mono little-endian PCM, got $fmt")
      val frames = ais.getFrameLength
      val data = ais.readAllBytes()
      var sum = 0L
      var i = 0
      while (i + 1 < data.length) {
        sum += ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
        i += 2
      }
      (fmt.getSampleRate.toInt, frames, sum)
    } finally ais.close()
  }

  /** Partition-batched WAV decode: real header + exact sample sum. */
  def decodeWavMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.map { r =>
      val (rate, frames, s) = wavStats(r.bytes)
      AudioMeta(r.media_id, rate, frames, s)
    })
  }

  /** Average-hash (aHash) perceptual fingerprint from REAL pixel decode —
    * the canonical cheap image near-dup signal (two images whose hashes
    * differ in ≤ a few bits are visual duplicates): the image is reduced
    * to an 8×8 grid of INTEGER block luma means (block (i,j) covers
    * [i·w div 8, (i+1)·w div 8) × [j·h div 8, (j+1)·h div 8); per-pixel
    * luma = (r+g+b) div 3; block mean = sum div npix — no float resampling,
    * so every bit is arithmetic an engine without a codec can replay from
    * a fixture's generation formula), and bit (i·8+j) is set when the
    * block mean exceeds the integer mean of the 64 block means.
    *
    * Requires w, h ≥ 8. Partition-batched decode like the other codec
    * passes; downstream hamming-distance bucketing rides the existing
    * simhash machinery (the hash IS a 64-bit simhash-compatible key).
    */
  def imageAHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { r =>
      ImageIO.setUseCache(false)
      val img = ImageIO.read(new ByteArrayInputStream(r.bytes))
      require(img != null, s"media_id=${r.media_id}: undecodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      require(w >= 8 && h >= 8, s"media_id=${r.media_id}: aHash needs >= 8x8, got ${w}x$h")
      val means = new Array[Long](64)
      var i = 0
      while (i < 8) {
        val x0 = i * w / 8; val x1 = (i + 1) * w / 8
        var j = 0
        while (j < 8) {
          val y0 = j * h / 8; val y1 = (j + 1) * h / 8
          var sum = 0L
          var x = x0
          while (x < x1) {
            var y = y0
            while (y < y1) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              y += 1
            }
            x += 1
          }
          means(i * 8 + j) = sum / ((x1 - x0).toLong * (y1 - y0))
          j += 1
        }
        i += 1
      }
      val gmean = means.sum / 64
      var hash = 0L
      var nSet = 0L
      var b = 0
      while (b < 64) {
        if (means(b) > gmean) { hash |= (1L << b); nSet += 1 }
        b += 1
      }
      ImageHash(r.media_id, w, h, hash, nSet)
    })
  }

  /** Per-frame energy + zero crossings from REAL WAV decode — the
    * front-end features of silence trimming and voice-activity detection:
    * frames of `frameLen` samples (last frame ragged), energy = exact
    * Σ s², crossings = #(i) with sᵢ·sᵢ₊₁ < 0 inside the frame. All
    * integer arithmetic, oracle-reproducible from a fixture's sample
    * formula.
    */
  def audioFrameEnergy(media: Dataset[MediaRow],
                       frameLen: Int = 32): Dataset[AudioFrame] = {
    require(frameLen >= 2, s"audioFrameEnergy: frameLen >= 2, got $frameLen")
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.flatMap { r =>
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.bytes))
      val samples =
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian, s"expected 16-bit mono LE PCM, got $fmt")
          val data = ais.readAllBytes()
          Array.tabulate(data.length / 2)(i =>
            ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort)
        } finally ais.close()
      samples.indices.grouped(frameLen).zipWithIndex.map { case (idx, f) =>
        var energy = 0L
        var cross = 0L
        idx.foreach { i =>
          energy += samples(i).toLong * samples(i)
          if (i + 1 <= idx.last && samples(i).toLong * samples(i + 1) < 0)
            cross += 1
        }
        AudioFrame(r.media_id, f.toLong, idx.size.toLong, energy, cross)
      }
    })
  }

  // ---- features / frames ----

  /** Features for payloads of UNKNOWN kind (no decoder dispatch): a
    * rolling hash of the bytes, deterministic so tests can assert exact
    * values. Image/audio/video all have REAL decode paths; this is the
    * honest fallback for kinds the library has never seen, never a stand-in
    * for a missing codec.
    */
  private[multimodal] def stubDecodeFeatures(bytes: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dims) {
      val x = h ^ (0x9e3779b97f4a7c15L * (d + 1))
      out(d) = ((x % 1000003L).toFloat / 1000003.0f)
      d += 1
    }
    out
  }

  /** Partition-batched featurization: one pass over each partition's rows,
    * codec invoked per payload inside the batch (the vectorization point).
    * Image, audio AND video features come from REAL decode — dimensions,
    * channel/sample statistics, and for video the [[Avi]] demuxer's
    * stream facts (dimensions, frame count, mean encoded frame size).
    * Unknown kinds get the labeled deterministic byte-hash fallback.
    * Output is padded/truncated to `dims`.
    */
  def featurize(media: Dataset[MediaRow], dims: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val raw: Array[Float] = r.kind match {
          case "image" =>
            val (w, h, sr, sg, sb) = imageStats(r.bytes)
            val np = (w.toLong * h).toFloat
            Array(w.toFloat, h.toFloat, sr / np, sg / np, sb / np)
          case "audio" =>
            val (rate, frames, s) = wavStats(r.bytes)
            Array(rate.toFloat, frames.toFloat,
              if (frames == 0) 0f else (s.toDouble / frames).toFloat)
          case "video" =>
            val v = Avi.demux(r.bytes)
            val n = v.frames.size
            Array(v.width.toFloat, v.height.toFloat, n.toFloat,
              if (n == 0) 0f
              else (v.frames.iterator.map(_.length.toLong).sum.toDouble / n).toFloat)
          case _ => stubDecodeFeatures(r.bytes, dims)
        }
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          java.util.Arrays.copyOf(raw, dims))
      }
    }
  }

  /** Byte-range payload chunking: the payload is sliced into `count`
    * deterministic chunks with frame indices — the kind-agnostic GRAIN
    * primitive (one row per chunk with exact integer boundaries),
    * oracle-gated by q53 over text payloads. Container-aware video frame
    * sampling is [[Avi.sampleFrames]] (real RIFF demux, q207-gated);
    * this stays the codec-free fallback for payloads that are not a
    * container at all.
    */
  def sampleFrames(media: Dataset[MediaRow], count: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val n = math.max(1, math.min(count, r.bytes.length))
      (0 until n).map { f =>
        val start = f * r.bytes.length / n
        val end = (f + 1) * r.bytes.length / n
        (r.media_id, f, r.bytes.slice(start, end))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Deterministic synthetic media fixture (tests/demos): REAL payloads
    * for all three kinds — checkerboard PNG, PCM WAV, and MJPEG-in-AVI
    * video ([[Avi.buildMjpeg]]).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      (id % 3).toInt match {
        case 0 =>
          val (w, h) = (8 + (id % 16).toInt, 6 + (id % 9).toInt)
          MediaRow(id, "image", checkerboardPng(id, w, h), w, h,
            sample_rate = 0, duration_ms = 0, format = "png")
        case 1 =>
          val bytes = toneWav(id)
          val samples = 64 + (id % 64).toInt
          MediaRow(id, "audio", bytes, 0, 0, sample_rate = 8000,
            duration_ms = samples * 1000 / 8000, format = "wav")
        case _ =>
          val (w, h, frames) =
            (8 + (id % 9).toInt, 6 + (id % 7).toInt, 2 + (id % 4).toInt)
          MediaRow(id, "video", Avi.buildMjpeg(id, w, h, frames), w, h,
            sample_rate = 0, duration_ms = frames * 100, format = "avi")
      }
    }
  }
}
