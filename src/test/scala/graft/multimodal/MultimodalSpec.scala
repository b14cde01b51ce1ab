package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing AND codecs: image/audio decode are real (JDK
  * `javax.imageio` / `javax.sound.sampled`); only video demux stays a
  * marked stub. Round-trips are asserted against closed-form expectations
  * — the same arithmetic the q63/q65 oracles use.
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
}
