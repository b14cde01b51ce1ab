package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns next to typed metadata, and
  * decode/feature/resize/frame-sample run as partition-batched functions
  * over the binary bytes — the Scala/JVM analogue of a Pandas-batched UDF
  * (`Dataset.mapPartitions` gives the same batch shape: an iterator of
  * rows per partition, vectorizable inside the lambda).
  *
  * The codec calls themselves are STUBS — no image/audio libraries ship in
  * this environment — implemented as deterministic byte-derived fakes and
  * marked as such. Everything around them is real and tested: the schema,
  * the binary-aware partitioning, the batch iteration shape, and the
  * feature join-back.
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

  /** Binary tables need byte-aware partitioning: a parquet split sized for
    * row counts puts gigabytes of payload in one task. Repartition to a
    * target payload volume per partition before the decode pass.
    */
  def repartitionByPayload(df: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val total = df.agg(sum(length(col("bytes")))).head
    val totalBytes = if (total.isNullAt(0)) 0L else total.getLong(0)
    val target = math.max(1L, targetBytesPerPartition)
    val parts = math.max(1L,
      math.min(200000L, (totalBytes + target - 1) / target)).toInt
    df.repartition(parts)
  }

  /** STUB decode: a real pipeline calls the image/audio codec here (the
    * bytes → pixels/samples step). Deterministic fake: features derived
    * from a rolling hash of the payload so tests can assert exact values
    * and reruns are reproducible.
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
    * codec invoked per payload inside the batch (the vectorization point),
    * typed output ready to join back or feed the ANN operators.
    */
  def featurize(media: Dataset[MediaRow], dims: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          stubDecodeFeatures(r.bytes, dims))
      }
    }
  }

  /** STUB resize: real impl decodes, scales, re-encodes. The fake keeps
    * the contract visible: output metadata reflects the requested size,
    * payload is a deterministic function of (input payload, w, h).
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { r =>
      val scaled = r.bytes.take(math.max(1, math.min(r.bytes.length, w * h)))
      r.copy(bytes = scaled, width = w, height = h)
    })
  }

  /** STUB frame sampling: real impl demuxes video and decodes every k-th
    * frame; the fake slices the payload into `count` deterministic chunks
    * with frame indices — the output grain (one row per sampled frame) is
    * the real contract.
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

  /** Deterministic synthetic media fixture (tests/demos). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val bytes = Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 131 + i * 7) % 251).toByte)
      MediaRow(id, kind, bytes, width = 64, height = 48,
        sample_rate = if (kind == "audio") 16000 else 0,
        duration_ms = if (kind == "image") 0 else 1000, format = "stub")
    }
  }
}
