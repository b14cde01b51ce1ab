package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing AND codecs: image/audio/video decode are all real
  * (JDK `javax.imageio` / `javax.sound.sampled`; pure-JVM RIFF demux in
  * [[AviSpec]]). Round-trips are asserted against closed-form
  * expectations — the same arithmetic the q63/q65/q207 oracles use.
  */
class MultimodalSpec extends SparkSpec {

  test("checkerboard PNG round-trips to exact dimensions and channel sums") {
    for (id <- Seq(0L, 1L, 17L, 255L, 1000L)) {
      val (w, h) = (8 + (id % 40).toInt, 8 + (id % 23).toInt)
      val (gw, gh, sr, sg, sb) = Multimodal.imageStats(
        Multimodal.checkerboardPng(id, w, h))
      assert((gw, gh) == (w, h))
      val np = w.toLong * h
      val ne = (np + (w % 2) * (h % 2)) / 2 // cells with (x+y) even
      def m(k: Long) = (id * k) % 256
      assert(sr == ne * m(7) + (np - ne) * m(17), s"id=$id sum_r")
      assert(sg == ne * m(11) + (np - ne) * m(19), s"id=$id sum_g")
      assert(sb == ne * m(13) + (np - ne) * m(23), s"id=$id sum_b")
    }
  }

  test("WAV round-trips to exact rate, frame count and sample sum") {
    for (id <- Seq(0L, 3L, 63L, 64L, 999L)) {
      val n = 64 + (id % 64).toInt
      val (rate, frames, sum) = Multimodal.wavStats(Multimodal.toneWav(id))
      assert(rate == 8000 && frames == n)
      val expected = (0 until n).map(i => ((id * 31 + i * 7) % 2003) - 1001).sum
      assert(sum == expected, s"id=$id")
    }
  }

  test("decodeImageMeta decodes the image rows of a media table") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val metas = Multimodal.decodeImageMeta(media).collect()
    val images = media.filter(_.kind == "image").collect()
    assert(metas.length == images.length && metas.nonEmpty)
    val byId = images.map(r => r.media_id -> r).toMap
    metas.foreach { m =>
      assert(m.width == byId(m.media_id).width &&
        m.height == byId(m.media_id).height)
      assert(m.n_pixels == m.width.toLong * m.height)
    }
  }

  test("decodeWavMeta decodes the audio rows of a media table") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val metas = Multimodal.decodeWavMeta(media).collect()
    val audios = media.filter(_.kind == "audio").collect()
    assert(metas.length == audios.length && metas.nonEmpty)
    metas.foreach { m =>
      assert(m.sample_rate == 8000)
      assert(m.n_frames == 64 + (m.media_id % 64))
    }
  }

  test("featurize emits typed features per row, deterministically") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.featurize(media, dims = 8)
    assert(f1.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "n_bytes", "features"))
    val a = f1.collect().sortBy(_.media_id)
    val b = Multimodal.featurize(media, dims = 8).collect().sortBy(_.media_id)
    assert(a.length == 30)
    assert(a.zip(b).forall { case (x, y) => x.features.sameElements(y.features) },
      "decode must be deterministic across runs")
    assert(a.forall(_.features.length == 8))
    // image features carry the REAL decoded dimensions
    val imgDims = Multimodal.syntheticMedia(spark, 30)
      .filter(_.kind == "image").collect().map(r => r.media_id -> r).toMap
    a.filter(_.kind == "image").foreach { f =>
      assert(f.features(0) == imgDims(f.media_id).width.toFloat &&
        f.features(1) == imgDims(f.media_id).height.toFloat)
    }
  }

  test("features join back to the media table and feed vector ops") {
    val media = Multimodal.syntheticMedia(spark, 12)
    val joined = Multimodal.featurize(media).toDF()
      .join(media.toDF().select(col("media_id"), col("kind").as("k2")), "media_id")
    assert(joined.count() == 12)
    assert(joined.filter(col("kind") =!= col("k2")).count() == 0)
  }

  test("resize really rescales: output decodes to the target dimensions") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val resized = Multimodal.resizeImages(media, 8, 4)
    val rows = resized.collect()
    assert(rows.nonEmpty && rows.forall(_.kind == "image"))
    assert(rows.forall(r => r.width == 8 && r.height == 4))
    Multimodal.decodeImageMeta(resized).collect().foreach { m =>
      assert(m.width == 8 && m.height == 4 && m.n_pixels == 32)
    }
  }

  test("frame sampling emits one row per sampled frame") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, 4)
    val videos = media.filter(_.kind == "video").count()
    assert(frames.count() == videos * 4)
    assert(frames.groupBy("media_id").count()
      .filter(col("count") =!= 4).count() == 0)
  }

  test("payload-aware repartitioning sizes partitions by bytes, not rows") {
    val media = Multimodal.syntheticMedia(spark, 100).toDF()
    val re = Multimodal.repartitionByPayload(media, targetBytesPerPartition = 1024)
    assert(re.rdd.getNumPartitions > 1)
    assert(re.count() == 100)
  }

  test("imageAHash: real decode matches the closed-form block arithmetic") {
    val s = spark; import s.implicits._
    val ids = Seq(3L, 17L, 40L)
    val media = ids.toDS().map { id =>
      val (w, h) = (8 + (id % 40).toInt, 8 + (id % 23).toInt)
      Multimodal.MediaRow(id, "image", Multimodal.checkerboardPng(id, w, h),
        w, h, 0, 0, "png")
    }
    val got = Multimodal.imageAHash(media)
      .collect().map(r => r.media_id -> ((r.ahash, r.n_set_bits))).toMap
    ids.foreach { id =>
      val (w, h) = (8 + (id % 40).toInt, 8 + (id % 23).toInt)
      def m(k: Long) = (id * k % 256)
      val l1 = (m(7) + m(11) + m(13)) / 3
      val l2 = (m(17) + m(19) + m(23)) / 3
      val means = for (i <- 0 until 8; j <- 0 until 8) yield {
        val (x0, x1) = (i * w / 8, (i + 1) * w / 8)
        val (y0, y1) = (j * h / 8, (j + 1) * h / 8)
        val (bw, bh) = (x1 - x0, y1 - y0)
        val ax = if ((x0 + y0) % 2 == 0) (bw + 1) / 2 else bw / 2
        val ne = ax * ((bh + 1) / 2) + (bw - ax) * (bh / 2)
        (i * 8 + j, (ne * l1 + (bw.toLong * bh - ne) * l2) / (bw.toLong * bh))
      }
      val gmean = means.map(_._2).sum / 64
      val bits = means.filter(_._2 > gmean).map(_._1)
      val hash = bits.foldLeft(0L)((a, b) => a | (1L << b))
      assert(got(id) == ((hash, bits.size.toLong)), s"id=$id")
    }
  }

  test("audioFrameEnergy: frames, ragged tail, crossings from the formula") {
    val s = spark; import s.implicits._
    val id = 9L
    val media = Seq(id).toDS().map { i =>
      Multimodal.MediaRow(i, "audio", Multimodal.toneWav(i), 0, 0, 8000,
        0, "wav")
    }
    val got = Multimodal.audioFrameEnergy(media)
      .collect().map(r => r.frame_idx ->
        ((r.n_samples, r.energy, r.n_crossings))).toMap
    val n = 64 + (id % 64).toInt
    val v = Array.tabulate(n)(i => ((id * 31 + i * 7) % 2003 - 1001).toInt)
    val want = v.indices.groupBy(_ / 32).map { case (f, idx) =>
      f.toLong -> ((idx.size.toLong,
        idx.map(i => v(i).toLong * v(i)).sum,
        idx.count(i => i + 1 <= idx.last && v(i).toLong * v(i + 1) < 0).toLong))
    }
    assert(got == want)
    assert(got.keySet == (0L until ((n + 31) / 32).toLong).toSet)
  }

}
