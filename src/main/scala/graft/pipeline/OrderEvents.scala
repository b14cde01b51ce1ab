package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The real silver-orders parse (analytics/spark/jobs/silver_orders.py:11-29,
  * 47-70): latest-wins dedup by kafka coordinate, permissive `from_json`
  * of the 10-field order.created payload with the `items
  * array<struct<product_id,qty,price>>` kept intact, flatten, and
  * event-time derivation. Item-level queries explode the carried array.
  */
object OrderEvents {

  /** Parse schema, field-for-field from silver_orders.py:11-29 (the
    * producer contract is services/order/app/api/routes.py:197-215).
    * `shipping` is declared-but-empty there and ignored here the same way.
    */
  val schema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("event_version", StringType),
    StructField("trace_id", StringType),
    StructField("order_id", StringType),
    StructField("user_id", StringType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("product_id", IntegerType),
      StructField("qty", IntegerType),
      StructField("price", DoubleType))))),
    StructField("currency", StringType),
    StructField("total_amount", DoubleType),
    StructField("status", StringType),
    StructField("event_time", StringType),
    StructField("event_id", StringType),
    StructField("ingest_ts", StringType)))

  /** Bronze rows → silver.orders_clean (silver_orders.py:47-70): W1 dedup
    * BEFORE the parse (cheaper — dedup runs on raw strings), then
    * permissive from_json (malformed/missing → null, never an error),
    * flatten with `items` carried opaquely, event_ts/event_date derived.
    */
  def parse(bronze: DataFrame): DataFrame = {
    val deduped = graft.lake.Upsert.latestWins(bronze,
      keys = Seq("topic", "partition", "offset"),
      ordering = Seq("kafka_timestamp"))
    deduped
      .withColumn("j", from_json(col("raw_value"), schema))
      .select(
        col("topic"), col("partition"), col("offset"), col("kafka_timestamp"),
        col("j.event_type").as("event_type"),
        col("j.order_id").cast("string").as("order_id"),
        col("j.user_id").as("user_id"),
        col("j.items").as("items"),
        col("j.currency").as("currency"),
        col("j.total_amount").cast("double").as("total_amount"),
        col("j.status").as("status"),
        col("j.event_time").as("event_time"),
        col("j.event_id").as("event_id"),
        col("j.ingest_ts").as("ingest_ts"))
      .withColumn("event_ts", to_timestamp(col("event_time")))
      .withColumn("event_date", to_date(col("event_ts")))
  }

  /** Item grain over the parsed table: explode the carried array —
    * per-product quantity and revenue (qty·price), decimal-exact.
    */
  def itemGrain(ordersClean: DataFrame): DataFrame =
    ordersClean
      .select(col("order_id"), explode(col("items")).as("item"))
      .groupBy(col("item.product_id").as("product_id"))
      .agg(
        sum(col("item.qty")).as("total_qty"),
        sum(col("item.qty").cast("decimal(18,2)") *
            col("item.price").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
}
