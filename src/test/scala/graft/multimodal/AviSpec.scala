package graft.multimodal

import graft.SparkSpec

/** RIFF/AVI demux: byte-exact round-trips of the writer, closed-form
  * raw-DIB pixel sums (the q207 oracle arithmetic), real MJPEG decode
  * through the JDK JPEG codec, and structural tolerance (odd-size pad
  * bytes, 'rec ' frame groups) an external writer's file would exercise.
  */
class AviSpec extends SparkSpec {

  private def dibSums(id: Long, w: Int, h: Int, f: Int): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      sr += (id * 7 + 3L * f + 5L * x + 3L * y) % 256
      sg += (id * 11 + 5L * f + 2L * x + 7L * y) % 256
      sb += (id * 13 + 7L * f + 4L * x + 1L * y) % 256
    }
    (sr, sg, sb)
  }

  test("raw-DIB AVI round-trips to closed-form per-frame channel sums") {
    for (id <- Seq(0L, 5L, 17L, 999L)) {
      val (w, h, n) = (8 + (id % 9).toInt, 6 + (id % 7).toInt, 2 + (id % 4).toInt)
      val v = Avi.demux(Avi.buildDib(id, w, h, n))
      assert(v.width == w && v.height == h && v.compression == 0)
      assert(v.frames.size == n)
      for (f <- 0 until n) {
        val (gw, gh, sr, sg, sb) = Avi.frameStats(v, v.frames(f))
        assert((gw, gh) == (w, h))
        assert((sr, sg, sb) == dibSums(id, w, h, f), s"id=$id frame=$f")
      }
    }
  }

  test("stride padding: widths with non-multiple-of-4 row bytes decode exactly") {
    // w=9 → rowBytes 27 → stride 28; w=10 → 30 → 32; w=8 → 24 → 24
    for (w <- Seq(8, 9, 10, 11)) {
      val v = Avi.demux(Avi.buildDib(42L, w, 5, 2))
      val (gw, gh, sr, sg, sb) = Avi.frameStats(v, v.frames(1))
      assert((gw, gh) == (w, 5))
      assert((sr, sg, sb) == dibSums(42L, w, 5, 1))
    }
  }

  test("MJPEG AVI: frame count + dimensions exact, solid color near-exact") {
    val (id, w, h, n) = (7L, 16, 12, 3)
    val v = Avi.demux(Avi.buildMjpeg(id, w, h, n))
    assert(v.width == w && v.height == h && v.compression == Avi.FccMjpg)
    assert(v.frames.size == n)
    for (f <- 0 until n) {
      val (gw, gh, sr, sg, sb) = Avi.frameStats(v, v.frames(f))
      assert((gw, gh) == (w, h), "JPEG SOF dims must survive the round-trip")
      // Solid-color frames: JPEG is lossy but a flat field decodes within
      // a couple of levels of the original mean.
      val np = (w * h).toDouble
      def near(sum: Long, c: Long) = math.abs(sum / np - c) <= 3.0
      assert(near(sr, (id * 7 + f * 29) % 256), s"frame $f red drifted")
      assert(near(sg, (id * 11 + f * 31) % 256), s"frame $f green drifted")
      assert(near(sb, (id * 13 + f * 37) % 256), s"frame $f blue drifted")
    }
  }

  test("external-writer shapes: odd-size chunks and 'rec ' groups parse") {
    // Hand-assemble a movi list with frames wrapped in a 'rec ' LIST and
    // an odd-sized junk chunk between them (both legal per the RIFF spec).
    val base = Avi.buildDib(3L, 9, 4, 2)
    val v0 = Avi.demux(base)
    // Rebuild: same header, movi holds LIST('rec ') with both frames plus
    // an odd-length 'JUNK' chunk that forces the pad-byte path.
    def le(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]) =
      fcc(id) ++ le(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    val junk = chunk("JUNK", Array[Byte](1, 2, 3)) // odd size 3 → padded
    val frameChunks = v0.frames.flatMap(f => chunk("00db", f)).toArray
    val recBody = fcc("rec ") ++ frameChunks
    val moviBody = fcc("movi") ++ junk ++ chunk("LIST", recBody)
    // Find the original hdrl LIST to reuse verbatim.
    val hdrlSize = {
      var off = 12
      var found = -1
      while (found < 0) {
        val sz = (base(off + 4) & 0xff) | ((base(off + 5) & 0xff) << 8) |
          ((base(off + 6) & 0xff) << 16) | ((base(off + 7) & 0xff) << 24)
        if (base(off) == 'L') found = off + 8 + sz + (sz & 1) else off += 8 + sz + (sz & 1)
      }
      found
    }
    val hdrl = base.slice(12, hdrlSize)
    val body = fcc("AVI ") ++ hdrl ++ chunk("LIST", moviBody)
    val rebuilt = fcc("RIFF") ++ le(body.length) ++ body
    val v1 = Avi.demux(rebuilt)
    assert(v1.width == 9 && v1.height == 4 && v1.frames.size == 2)
    for (f <- 0 until 2)
      assert(Avi.frameStats(v1, v1.frames(f)) == Avi.frameStats(v0, v0.frames(f)))
  }

  test("truncated container fails loudly, not quietly") {
    val good = Avi.buildDib(1L, 8, 6, 2)
    intercept[IllegalArgumentException](Avi.demux(good.take(40)))
    intercept[IllegalArgumentException](Avi.demux("not an avi".getBytes))
  }

  test("decodeVideoMeta: frame-grain rows with exact sums over a media table") {
    val s = spark; import s.implicits._
    val media = Seq(0L, 5L, 17L).toDS().map { id =>
      val (w, h, n) = (8 + (id % 9).toInt, 6 + (id % 7).toInt, 2 + (id % 4).toInt)
      Multimodal.MediaRow(id, "video", Avi.buildDib(id, w, h, n), w, h, 0,
        n * 100, "avi")
    }
    val rows = Avi.decodeVideoMeta(media).collect()
    assert(rows.map(r => (r.media_id, r.frame_idx)).toSet ==
      Seq(0L, 5L, 17L).flatMap { id =>
        (0 until 2 + (id % 4).toInt).map(f => (id, f))
      }.toSet)
    rows.foreach { r =>
      val (sr, sg, sb) = dibSums(r.media_id, r.width, r.height, r.frame_idx)
      assert((r.sum_r, r.sum_g, r.sum_b) == (sr, sg, sb))
      assert(r.n_frames == 2 + (r.media_id % 4).toInt)
    }
  }

  test("Avi.sampleFrames: uniform indices over the REAL frame sequence") {
    val s = spark; import s.implicits._
    val media = Seq(100L).toDS().map { id =>
      Multimodal.MediaRow(id, "video", Avi.buildDib(id, 8, 6, 5), 8, 6, 0,
        500, "avi")
    }
    // n=5, count=3 → indices 0, 1, 3; count=8 > n → each of 0..4 once.
    val s3 = Avi.sampleFrames(media, 3).collect()
      .map(r => r.getInt(1)).sorted.toSeq
    assert(s3 == Seq(0, 1, 3))
    val s8 = Avi.sampleFrames(media, 8).collect()
      .map(r => r.getInt(1)).sorted.toSeq
    assert(s8 == Seq(0, 1, 2, 3, 4))
    // sampled bytes are the actual demuxed frames
    val all = Avi.demux(Avi.buildDib(100L, 8, 6, 5)).frames
    Avi.sampleFrames(media, 3).collect().foreach { r =>
      assert(r.getAs[Array[Byte]](2).sameElements(all(r.getInt(1))))
    }
  }

  test("featurize video: real demux facts (dims, frame count)") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.featurize(media, dims = 8).collect()
      .filter(_.kind == "video")
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val id = f.media_id
      assert(f.features(0) == (8 + (id % 9)).toFloat)
      assert(f.features(1) == (6 + (id % 7)).toFloat)
      assert(f.features(2) == (2 + (id % 4)).toFloat)
      assert(f.features(3) > 0f) // mean encoded JPEG frame size
    }
  }
}
