package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Kafka-shaped record: the 7 columns Spark's kafka source exposes.
  * Locally (no kafka connector jar) tests feed these through
  * `MemoryStream[KafkaRecord]`; on a cluster `spark.readStream
  * .format("kafka")` yields the same shape and everything downstream is
  * identical (SURVEY §2.1 S1).
  */
case class KafkaRecord(key: Array[Byte], value: Array[Byte], topic: String,
                       partition: Int, offset: Long,
                       timestamp: java.sql.Timestamp, timestampType: Int)

/** Streaming bronze ingest — the reference's front door
  * (analytics/spark/jobs/bronze_orders_raw.py:37-63): kafka envelope →
  * cast/stamp projection → checkpointed append sink on a 10 s trigger.
  *
  * Exactly-once to the table is the checkpoint's job; duplicate deliveries
  * from the at-least-once source are eliminated structurally downstream
  * (silver dedup by (topic, partition, offset) + idempotent merge —
  * SURVEY §2.9), which BronzeIngestSpec replays end-to-end.
  */
object BronzeIngest {

  /** P1 envelope projection (bronze_orders_raw.py:45-53): binary key/value
    * cast to string, kafka metadata carried, ingest stamped. `clock`
    * injectable for deterministic tests.
    */
  def bronzeProject(kafka: DataFrame, clock: Column = current_timestamp()): DataFrame =
    kafka.select(
      col("key").cast("string").as("raw_key"),
      col("value").cast("string").as("raw_value"),
      col("topic"),
      col("partition"),
      col("offset"),
      col("timestamp").as("kafka_timestamp"),
      clock.as("ingest_ts"),
      col("timestampType"))

  /** The reference's micro-batch cadence (bronze_orders_raw.py:60). */
  val DefaultTrigger: Trigger = Trigger.ProcessingTime("10 seconds")

  /** Checkpointed parquet append sink (S2). Restarting with the same
    * checkpoint resumes from the committed offsets — no reprocessing, no
    * lost batches.
    */
  def start(bronze: DataFrame, path: String, checkpoint: String,
            trigger: Trigger = DefaultTrigger): StreamingQuery =
    bronze.writeStream
      .format("parquet")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start(path)
}
