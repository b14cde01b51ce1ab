package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic bronze Kafka topics synthesized from the TPC-H tables, so
  * the REAL silver parses ([[OrderEvents.parse]], [[PaymentEvents.parse]])
  * can be oracle-gated end-to-end: the DuckDB oracle reconstructs the same
  * flattened output directly from the base columns, which proves the
  * JSON round trip (build → permissive parse → flatten) is lossless.
  *
  * Payload shapes follow the producers the jobs parse
  * (services/order/app/api/routes.py:197-215 for orders,
  * analytics/spark/jobs/silver_payments.py:11-17 for payments); every
  * derived value is row-local arithmetic both engines reproduce exactly.
  *
  * Each topic plants three behaviors the parse must handle:
  *  - a STALE duplicate per (topic, partition, offset) — older
  *    kafka_timestamp, corrupt payload — which latest-wins dedup must drop;
  *  - an UPDATED duplicate — newer kafka_timestamp, changed payload — which
  *    dedup must keep over the original (orderkey % 13);
  *  - a malformed payload (orderkey % 97) the permissive from_json must
  *    null-out, never error on.
  */
object BronzeFixtures {

  private val malformed = col("o_orderkey") % 97 === 0
  private val updated = col("o_orderkey") % 13 === 0
  private val stale = col("o_orderkey") % 10 === 0

  /** One pass over the base rows: each row emits its original delivery
    * plus its planted duplicates as an exploded variant array — the base
    * (and its expensive per-order items aggregation) is computed ONCE,
    * not once per union branch.
    */
  private def deliver(base: DataFrame, topic: String, partitions: Int,
                      original: Column, staleDup: Column,
                      updatedDup: Column): DataFrame =
    base.select(
      lit(topic).as("topic"),
      (col("o_orderkey") % partitions).cast("int").as("partition"),
      col("o_orderkey").as("offset"),
      explode(filter(array(
        struct(col("o_orderdate").as("kafka_timestamp"),
          original.as("raw_value")),
        when(stale, struct(
          (col("o_orderdate") - expr("INTERVAL 1 HOUR")).as("kafka_timestamp"),
          staleDup.as("raw_value"))),
        when(updated, struct(
          (col("o_orderdate") + expr("INTERVAL 1 HOUR")).as("kafka_timestamp"),
          updatedDup.as("raw_value")))),
        v => v.isNotNull)).as("d"))
      .select(col("topic"), col("partition"), col("offset"),
        col("d.kafka_timestamp").as("kafka_timestamp"),
        col("d.raw_value").as("raw_value"))

  /** orders.created bronze: the 12-field order.created payload, with the
    * per-order `items array<struct>` built from lineitem (sorted by the
    * item struct itself — (product_id, qty, price) — so array order is
    * deterministic; l_linenumber is not unique in the test data).
    */
  def ordersBronze(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val items = lineitem.groupBy(col("l_orderkey")).agg(
      array_sort(collect_list(struct(
        col("l_partkey").cast("int").as("product_id"),
        col("l_quantity").cast("int").as("qty"),
        col("l_extendedprice").as("price")))).as("items"))
    val base = orders.join(items, col("o_orderkey") === col("l_orderkey"), "left")

    def payload(status: Column): Column = to_json(struct(
      lit("order.created").as("event_type"),
      lit("1.0").as("event_version"),
      md5(concat(lit("tr-"), col("o_orderkey").cast("string"))).as("trace_id"),
      col("o_orderkey").cast("string").as("order_id"),
      concat(lit("u"), col("o_custkey").cast("string")).as("user_id"),
      col("items").as("items"),
      lit("USD").as("currency"),
      col("o_totalprice").as("total_amount"),
      status.as("status"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("event_time"),
      md5(concat(lit("oe-"), col("o_orderkey").cast("string"))).as("event_id"),
      lit("2026-01-01 00:00:00").as("ingest_ts")))

    deliver(base, "orders.created", 8,
      original = when(malformed, lit("{malformed"))
        .otherwise(payload(col("o_orderstatus"))),
      staleDup = lit("{stale corrupt"),
      updatedDup = payload(lit("UPDATED")))
  }

  /** payments bronze: the 5-field payment payload of silver_payments.py:11-17.
    * amount_cents goes through DECIMAL(18,2)·100 so both engines derive the
    * identical integer from the double money column.
    */
  def paymentsBronze(orders: DataFrame): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")

    def payload(typ: Column, amountCents: Column): Column = to_json(struct(
      typ.as("type"),
      col("o_orderkey").as("order_id"),
      amountCents.as("amount_cents"),
      lit("USD").as("currency"),
      concat(lit("u"), col("o_custkey").cast("string"), lit("@example.com"))
        .as("user_email")))

    deliver(orders, "payments.captured", 4,
      original = when(malformed, lit("{malformed"))
        .otherwise(payload(lit("payment.captured"), cents)),
      staleDup = lit("{stale corrupt"),
      updatedDup = payload(lit("payment.refunded"), cents + 500))
  }
}
