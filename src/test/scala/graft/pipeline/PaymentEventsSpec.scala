package graft.pipeline

import graft.SparkSpec
import graft.streaming.{BronzeIngest, KafkaRecord}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Payments parse fidelity: cents→dollars, coordinate-derived ids,
  * null backfills, dedup, and tolerance of both producer envelope shapes.
  */
class PaymentEventsSpec extends SparkSpec {

  private val clock = lit(Timestamp.valueOf("2024-01-01 00:00:00")).cast("timestamp")

  private def rec(off: Long, json: String, ts: String) = KafkaRecord(
    key = "77".getBytes, value = json.getBytes, topic = "payments.events",
    partition = 0, offset = off, timestamp = Timestamp.valueOf(ts),
    timestampType = 0)

  test("5-field demo payload parses with cents→dollars and sha2 coordinate ids") {
    import spark.implicits._
    val demo = """{"type": "payment.succeeded", "order_id": 77, """ +
      """"amount_cents": 12345, "currency": "USD", "user_email": "a@b.c"}"""
    val silver = PaymentEvents.parse(BronzeIngest.bronzeProject(
      Seq(rec(0L, demo, "2024-01-01 01:00:00")).toDF(), clock))
    val row = silver.head
    assert(row.getAs[String]("order_id") == "77")
    assert(row.getAs[Double]("amount") == 123.45)
    assert(row.getAs[String]("status") == "payment.succeeded")
    assert(row.getAs[String]("method") == null && row.getAs[String]("event_time") == null)
    assert(row.getAs[String]("event_id") == row.getAs[String]("payment_id"))
    assert(row.getAs[String]("event_id").length == 64, "sha2-256 hex id")
    assert(row.getAs[Timestamp]("event_ts") == Timestamp.valueOf("2024-01-01 01:00:00"))
  }

  test("richer producer envelope parses permissively (extra fields ignored, missing null)") {
    import spark.implicits._
    val rich = """{"event_type": "payment.succeeded", "payment_id": "p-1", """ +
      """"order_id": 78, "amount": 99.5, "method": "card", "status": "ok"}"""
    val silver = PaymentEvents.parse(BronzeIngest.bronzeProject(
      Seq(rec(1L, rich, "2024-01-01 01:01:00")).toDF(), clock))
    val row = silver.head
    assert(row.getAs[String]("order_id") == "78")
    assert(row.isNullAt(row.fieldIndex("amount")), "no amount_cents → null dollars")
    assert(row.isNullAt(row.fieldIndex("status")), "no `type` field → null status")
  }

  test("duplicate coordinates collapse latest-wins; aggregates feed enrichment") {
    import spark.implicits._
    val mk = (cents: Long) => s"""{"type": "payment.succeeded", "order_id": 9, """ +
      s""""amount_cents": $cents, "currency": "USD", "user_email": "x@y.z"}"""
    val rows = Seq(
      rec(5L, mk(1000), "2024-01-01 01:00:00"),
      rec(5L, mk(2000), "2024-01-01 01:02:00"), // replay wins
      rec(6L, mk(500), "2024-01-01 01:03:00"))
    val silver = PaymentEvents.parse(BronzeIngest.bronzeProject(rows.toDF(), clock))
    assert(silver.count() == 2)
    val agg = PaymentEvents.paymentAgg(silver).head
    assert(agg.getAs[String]("order_id") == "9")
    assert(agg.getAs[Double]("paid_amount") == 25.0)
    assert(agg.getAs[Timestamp]("last_payment_ts") == Timestamp.valueOf("2024-01-01 01:03:00"))
  }
}
