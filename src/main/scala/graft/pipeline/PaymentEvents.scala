package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The silver-payments parse (analytics/spark/jobs/silver_payments.py:11-58):
  * dedup by kafka coordinate, permissive 5-field parse, cents→dollars,
  * synthetic ids from the kafka coordinate, and null-backfilled columns so
  * payments align with the orders_clean shape.
  *
  * The producer has a richer envelope (payment producer.py:82-109 emits
  * `amount` float + payment_id/method/status) than the 5-field demo shape
  * the job expects — permissive from_json tolerates both: unknown fields
  * are ignored, missing ones are null (SURVEY §1.2 notes the discrepancy).
  */
object PaymentEvents {

  /** Parse schema, field-for-field from silver_payments.py:11-17. */
  val schema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("order_id", LongType),
    StructField("amount_cents", LongType),
    StructField("currency", StringType),
    StructField("user_email", StringType)))

  /** Bronze rows → silver.payments_clean (silver_payments.py:39-58):
    *  - W1 dedup by (topic, partition, offset), latest kafka_timestamp;
    *  - amount = amount_cents / 100.0 (line 45);
    *  - status from `type`; method/event_time/ingest_ts null (49-51);
    *  - event_id = payment_id = sha2(topic:partition:offset) (53-54);
    *  - event_ts = kafka_timestamp (56), event_date (57).
    */
  def parse(bronze: DataFrame): DataFrame = {
    val deduped = graft.lake.Upsert.latestWins(bronze,
      keys = Seq("topic", "partition", "offset"),
      ordering = Seq("kafka_timestamp"))
    val coordId = sha2(concat_ws(":",
      col("topic"), col("partition"), col("offset")), 256)
    deduped
      .withColumn("j", from_json(col("raw_value"), schema))
      .select(
        col("topic"), col("partition"), col("offset"), col("kafka_timestamp"),
        col("j.order_id").cast("string").as("order_id"),
        (col("j.amount_cents") / 100.0).as("amount"),
        col("j.currency").as("currency"),
        col("j.type").as("status"),
        lit(null).cast("string").as("method"),
        lit(null).cast("string").as("event_time"),
        lit(null).cast("string").as("ingest_ts"),
        coordId.as("event_id"),
        coordId.as("payment_id"))
      .withColumn("event_ts", col("kafka_timestamp"))
      .withColumn("event_date", to_date(col("event_ts")))
  }

  /** Per-order payment aggregates (silver_enrich.py:25-30) over the
    * parsed table — the A1 shape feeding the enrichment join.
    */
  def paymentAgg(paymentsClean: DataFrame): DataFrame =
    paymentsClean.groupBy(col("order_id"))
      .agg(Medallion.moneySum(col("amount")).as("paid_amount"),
           max(col("event_ts")).as("last_payment_ts"))
}
