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

  private def envelope(topic: String, partitions: Int): Seq[Column] = Seq(
    lit(topic).as("topic"),
    (col("o_orderkey") % partitions).cast("int").as("partition"),
    col("o_orderkey").as("offset"))

  private val malformed = col("o_orderkey") % 97 === 0
  private val updated = col("o_orderkey") % 13 === 0
  private val stale = col("o_orderkey") % 10 === 0

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

    val env = envelope("orders.created", 8)
    val original = base.select(env ++ Seq(
      col("o_orderdate").as("kafka_timestamp"),
      when(malformed, lit("{malformed")).otherwise(payload(col("o_orderstatus")))
        .as("raw_value")): _*)
    val staleDup = base.filter(stale).select(env ++ Seq(
      (col("o_orderdate") - expr("INTERVAL 1 HOUR")).as("kafka_timestamp"),
      lit("{stale corrupt").as("raw_value")): _*)
    val updatedDup = base.filter(updated).select(env ++ Seq(
      (col("o_orderdate") + expr("INTERVAL 1 HOUR")).as("kafka_timestamp"),
      payload(lit("UPDATED")).as("raw_value")): _*)
    original.unionByName(staleDup).unionByName(updatedDup)
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

    val env = envelope("payments.captured", 4)
    val original = orders.select(env ++ Seq(
      col("o_orderdate").as("kafka_timestamp"),
      when(malformed, lit("{malformed"))
        .otherwise(payload(lit("payment.captured"), cents)).as("raw_value")): _*)
    val staleDup = orders.filter(stale).select(env ++ Seq(
      (col("o_orderdate") - expr("INTERVAL 1 HOUR")).as("kafka_timestamp"),
      lit("{stale corrupt").as("raw_value")): _*)
    val updatedDup = orders.filter(updated).select(env ++ Seq(
      (col("o_orderdate") + expr("INTERVAL 1 HOUR")).as("kafka_timestamp"),
      payload(lit("payment.refunded"), cents + 500).as("raw_value")): _*)
    original.unionByName(staleDup).unionByName(updatedDup)
  }
}
