package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batch shape, determinism, partitioning —
  * the codec itself is a marked stub (no media libs in this environment).
  */
class MultimodalSpec extends SparkSpec {

  test("featurize emits typed features per row, deterministically") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.featurize(media, dims = 8)
    assert(f1.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "n_bytes", "features"))
    val a = f1.collect().sortBy(_.media_id)
    val b = Multimodal.featurize(media, dims = 8).collect().sortBy(_.media_id)
    assert(a.length == 30)
    assert(a.zip(b).forall { case (x, y) => x.features.sameElements(y.features) },
      "stub decode must be deterministic across runs")
    assert(a.forall(_.features.length == 8))
  }

  test("features join back to the media table and feed vector ops") {
    val media = Multimodal.syntheticMedia(spark, 12)
    val joined = Multimodal.featurize(media).toDF()
      .join(media.toDF().select(col("media_id"), col("kind").as("k2")), "media_id")
    assert(joined.count() == 12)
    assert(joined.filter(col("kind") =!= col("k2")).count() == 0)
  }

  test("resize stub keeps contract: image-only, metadata reflects target size") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val resized = Multimodal.resizeImages(media, 8, 4).collect()
    assert(resized.nonEmpty && resized.forall(_.kind == "image"))
    assert(resized.forall(r => r.width == 8 && r.height == 4))
    assert(resized.forall(_.bytes.length <= 32))
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
