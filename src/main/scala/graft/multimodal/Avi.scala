package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pure-JVM RIFF/AVI video demux — removes the repo's last codec stub.
  *
  * The AVI container is a RIFF tree (public Microsoft "AVI RIFF File
  * Reference" layout): `RIFF('AVI ')` wrapping `LIST('hdrl')` (a main
  * header plus one `LIST('strl')` per stream, whose `strf` chunk is a
  * BITMAPINFOHEADER for video) and `LIST('movi')` holding the frame
  * chunks — `00db` for uncompressed device-independent bitmaps (bottom-up
  * BGR rows, 4-byte stride padding), `00dc` for compressed frames (MJPEG
  * = one whole JPEG per chunk, decodable by the JDK's `javax.imageio`).
  * Chunks are word-aligned (odd sizes carry a pad byte) and some writers
  * group frames in `LIST('rec ')` sublists; the demuxer handles both.
  *
  * Both directions ship: [[buildDib]]/[[buildMjpeg]] write byte-exact
  * fixtures (and give any test a real AVI), [[demux]] parses ANY
  * straightforward single-video-stream AVI. Frame decode is real for both
  * frame encodings — raw DIB rows are unpacked directly (integer-exact,
  * so the q207 oracle replays pixel sums from the fixture formula alone),
  * MJPEG frames go through the JDK JPEG codec.
  *
  * Scale posture: demux is row-local (one payload in, frame rows out) —
  * it rides `mapPartitions` exactly like the image/audio codec passes,
  * with [[Multimodal.repartitionByPayload]] sizing partitions by payload
  * bytes, and nothing touches the driver.
  */
object Avi {

  /** One demuxed stream: BITMAPINFOHEADER facts + the raw frame chunks in
    * `movi` order. `compression` is 0 for raw DIB, 'MJPG' (LE fourcc) for
    * motion-JPEG.
    */
  final case class AviVideo(width: Int, height: Int, compression: Int,
                            frames: Vector[Array[Byte]])

  /** Decoded per-frame facts: grain (media_id, frame_idx), stream frame
    * count, decoded dimensions and exact per-channel pixel sums — the
    * [[Multimodal.ImageMeta]] contract at frame grain.
    */
  final case class VideoFrameMeta(media_id: Long, frame_idx: Int,
                                  n_frames: Int, width: Int, height: Int,
                                  sum_r: Long, sum_g: Long, sum_b: Long)

  private val FccRiff = fourcc("RIFF")
  private val FccAvi = fourcc("AVI ")
  private val FccList = fourcc("LIST")
  private val FccHdrl = fourcc("hdrl")
  private val FccStrl = fourcc("strl")
  private val FccStrf = fourcc("strf")
  private val FccStrh = fourcc("strh")
  private val FccVids = fourcc("vids")
  private val FccMovi = fourcc("movi")
  private val FccRec = fourcc("rec ")
  val FccMjpg: Int = fourcc("MJPG")

  private def fourcc(s: String): Int = {
    require(s.length == 4, s"fourcc needs 4 chars: '$s'")
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) |
      ((s(3) & 0xff) << 24)
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  // ---- writer ----

  private final class LeOut {
    val bos = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    def bytes(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    def chunk(fcc: Int, body: Array[Byte]): Unit = {
      u32(fcc); u32(body.length); bytes(body)
      if ((body.length & 1) == 1) bos.write(0) // word alignment pad
    }
    def toArray: Array[Byte] = bos.toByteArray
  }

  private def list(fcc: Int)(fill: LeOut => Unit): Array[Byte] = {
    val inner = new LeOut
    inner.u32(fcc)
    fill(inner)
    inner.toArray
  }

  /** Assemble a single-video-stream AVI around pre-encoded frame chunks.
    * `compression` 0 → `00db` raw-DIB chunks; anything else → `00dc`.
    */
  def buildAvi(w: Int, h: Int, compression: Int,
               frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty, s"bad AVI ${w}x$h/${frames.size}")
    val maxFrame = frames.map(_.length).max
    val strf = { // BITMAPINFOHEADER
      val o = new LeOut
      o.u32(40); o.u32(w); o.u32(h); o.u16(1); o.u16(24)
      o.u32(compression); o.u32(maxFrame); o.u32(0); o.u32(0); o.u32(0); o.u32(0)
      o.toArray
    }
    val strh = { // AVISTREAMHEADER: vids, 10 fps, length = frame count
      val o = new LeOut
      o.u32(FccVids); o.u32(compression); o.u32(0); o.u16(0); o.u16(0)
      o.u32(0); o.u32(1); o.u32(10); o.u32(0); o.u32(frames.size)
      o.u32(maxFrame); o.u32(-1); o.u32(0)
      o.u16(0); o.u16(0); o.u16(w); o.u16(h)
      o.toArray
    }
    val avih = { // MainAVIHeader: 100ms/frame, 1 stream
      val o = new LeOut
      o.u32(100000); o.u32(maxFrame * 10); o.u32(0); o.u32(0x10 /*HASINDEX*/)
      o.u32(frames.size); o.u32(0); o.u32(1); o.u32(maxFrame)
      o.u32(w); o.u32(h); o.u32(0); o.u32(0); o.u32(0); o.u32(0)
      o.toArray
    }
    val frameFcc = fourcc(if (compression == 0) "00db" else "00dc")
    val hdrl = list(FccHdrl) { o =>
      o.chunk(fourcc("avih"), avih)
      o.chunk(FccList, list(FccStrl) { s =>
        s.chunk(FccStrh, strh)
        s.chunk(FccStrf, strf)
      })
    }
    val movi = list(FccMovi)(o => frames.foreach(f => o.chunk(frameFcc, f)))
    val idx1 = { // one entry per frame: ckid, AVIIF_KEYFRAME, offset, size
      val o = new LeOut
      var off = 4 // offsets are movi-relative, past the 'movi' fourcc
      frames.foreach { f =>
        o.u32(frameFcc); o.u32(0x10); o.u32(off); o.u32(f.length)
        off += 8 + f.length + (f.length & 1)
      }
      o.toArray
    }
    val root = new LeOut
    root.u32(FccAvi)
    root.chunk(FccList, hdrl)
    root.chunk(FccList, movi)
    root.chunk(fourcc("idx1"), idx1)
    val body = root.toArray
    val out = new LeOut
    out.u32(FccRiff); out.u32(body.length); out.bytes(body)
    out.toArray
  }

  /** Pack bottom-up BGR rows (4-byte stride padding) from a top-down RGB
    * pixel function — the DIB layout `00db` chunks carry.
    */
  def dibFrame(w: Int, h: Int)(rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val rowOff = (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        out(rowOff + 3 * x) = b.toByte
        out(rowOff + 3 * x + 1) = g.toByte
        out(rowOff + 3 * x + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Deterministic raw-DIB AVI fixture: frame f's pixel (x,y) has
    * channels ((id·7 + 3f + 5x + 3y) mod 256, (id·11 + 5f + 2x + 7y) mod
    * 256, (id·13 + 7f + 4x + y) mod 256) — per-pixel-varying so a stride
    * or row-order bug shifts the sums, yet closed-form for the q207
    * oracle.
    */
  def buildDib(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] =
    buildAvi(w, h, 0, (0 until nFrames).map { f =>
      dibFrame(w, h) { (x, y) =>
        (((id * 7 + 3L * f + 5L * x + 3L * y) % 256).toInt,
          ((id * 11 + 5L * f + 2L * x + 7L * y) % 256).toInt,
          ((id * 13 + 7L * f + 4L * x + 1L * y) % 256).toInt)
      }
    })

  /** Deterministic MJPEG AVI fixture: each frame is a solid-color image
    * JPEG-encoded by the JDK codec (lossy, so pixel sums are NOT
    * closed-form — structure facts are: frame count and dimensions).
    */
  def buildMjpeg(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] =
    buildAvi(w, h, FccMjpg, (0 until nFrames).map { f =>
      ImageIO.setUseCache(false)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val c = (((id * 7 + f * 29) % 256).toInt << 16) |
        (((id * 11 + f * 31) % 256).toInt << 8) | ((id * 13 + f * 37) % 256).toInt
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    })

  // ---- demuxer ----

  /** Parse a single-video-stream AVI: BITMAPINFOHEADER facts + frame
    * chunks in `movi` order ('rec ' groups flattened). Fails loudly on
    * structural violations — silent tolerance of a truncated container
    * corrupts every decode downstream.
    */
  def demux(bytes: Array[Byte]): AviVideo = {
    require(bytes.length >= 12 && le32(bytes, 0) == FccRiff &&
      le32(bytes, 8) == FccAvi, "not a RIFF/AVI payload")
    var width = -1
    var height = -1
    var compression = -1
    val frames = Vector.newBuilder[Array[Byte]]

    // Walk one chunk run [off, end); recurse into the LISTs that matter.
    def walk(off0: Int, end: Int, inMovi: Boolean, inStrl: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val fcc = le32(bytes, off)
        val size = le32(bytes, off + 4)
        require(size >= 0 && off + 8 + size <= end,
          s"chunk overruns container at offset $off")
        if (fcc == FccList) {
          require(size >= 4, s"LIST too short at offset $off")
          val kind = le32(bytes, off + 8)
          if (kind == FccHdrl || kind == FccStrl || kind == FccMovi ||
            (inMovi && kind == FccRec))
            walk(off + 12, off + 8 + size,
              inMovi || kind == FccMovi, kind == FccStrl)
        } else if (inStrl && fcc == FccStrf && compression == -1) {
          require(size >= 20, "BITMAPINFOHEADER too short")
          width = le32(bytes, off + 8 + 4)
          height = le32(bytes, off + 8 + 8)
          compression = le32(bytes, off + 8 + 16)
        } else if (inMovi) {
          // ##db / ##dc data chunks of the first (video) stream.
          val tail = (fcc >>> 16) & 0xffff
          val dbTail = (('d' & 0xff) | (('b' & 0xff) << 8))
          val dcTail = (('d' & 0xff) | (('c' & 0xff) << 8))
          if (tail == dbTail || tail == dcTail)
            frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
        }
        off += 8 + size + (size & 1) // word alignment
      }
    }
    walk(12, math.min(bytes.length, 8 + le32(bytes, 4)), inMovi = false,
      inStrl = false)
    require(width > 0 && height > 0 && compression >= 0,
      "no video stream header (strl/strf) found")
    AviVideo(width, height, compression, frames.result())
  }

  /** Decode one frame to (width, height, sum_r, sum_g, sum_b) — raw DIB
    * rows unpacked directly, anything else through the JDK image codec
    * (MJPEG = whole JPEGs per chunk).
    */
  def frameStats(v: AviVideo, frame: Array[Byte]): (Int, Int, Long, Long, Long) =
    if (v.compression == 0) {
      val (w, h) = (v.width, v.height)
      val stride = (w * 3 + 3) & ~3
      require(frame.length == stride * h,
        s"DIB frame size ${frame.length} != stride $stride x $h")
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        val rowOff = (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          sb += frame(rowOff + 3 * x) & 0xff
          sg += frame(rowOff + 3 * x + 1) & 0xff
          sr += frame(rowOff + 3 * x + 2) & 0xff
          x += 1
        }
        y += 1
      }
      (w, h, sr, sg, sb)
    } else {
      Multimodal.imageStats(frame)
    }

  // ---- Spark passes ----

  /** Partition-batched demux+decode over the video rows of a media table:
    * one output row per frame with real decoded dimensions and exact
    * channel sums (q207's gate). The frame-grain analogue of
    * [[Multimodal.decodeImageMeta]].
    */
  def decodeVideoMeta(media: Dataset[Multimodal.MediaRow]): Dataset[VideoFrameMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { r =>
      val v = demux(r.bytes)
      v.frames.iterator.zipWithIndex.map { case (fb, idx) =>
        val (w, h, sr, sg, sb) = frameStats(v, fb)
        VideoFrameMeta(r.media_id, idx, v.frames.size, w, h, sr, sg, sb)
      }
    })
  }

  /** REAL frame sampling — the container-aware successor of the byte-slice
    * chunker: demux, then take `count` uniformly-spaced frames (indices
    * ⌊f·n/count⌋, deduped when n < count), one row per sampled frame with
    * its actual encoded bytes.
    */
  def sampleFrames(media: Dataset[Multimodal.MediaRow], count: Int): DataFrame = {
    require(count >= 1, s"sampleFrames: count >= 1, got $count")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val v = demux(r.bytes)
      val n = v.frames.size
      (0 until count).map(f => f * n / count).distinct.map { idx =>
        (r.media_id, idx, v.frames(idx))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
