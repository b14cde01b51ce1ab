package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

/** Producer-side fixture generator (SURVEY §2.1 S10): emits the exact
  * order.created JSON the reference's order service publishes
  * (services/order/app/api/routes.py:197-215, field order included), as
  * kafka-shaped records keyed by order_id. Used by streaming tests and
  * demos; a real deployment swaps this for the kafka source.
  */
object EventFixtures {

  case class Item(productId: Int, qty: Int, price: Double)

  case class OrderCreated(orderId: String, userId: String, items: Seq[Item],
                          totalAmount: Double, eventTime: String,
                          eventId: String, traceId: String = "trace-0")

  /** The producer payload, field order matching routes.py:197-215. */
  def orderCreatedJson(e: OrderCreated): String = {
    val items = e.items.map(i =>
      s"""{"product_id": ${i.productId}, "qty": ${i.qty}, "price": ${i.price}}""")
      .mkString("[", ", ", "]")
    s"""{"event_type": "order.created", "event_version": "1.0", """ +
      s""""trace_id": "${e.traceId}", "order_id": "${e.orderId}", """ +
      s""""user_id": "${e.userId}", "items": $items, "currency": "USD", """ +
      s""""total_amount": ${e.totalAmount}, "status": "PENDING_PAYMENT", """ +
      s""""event_time": "${e.eventTime}", "shipping": {}, """ +
      s""""event_id": "${e.eventId}", "ingest_ts": "${e.eventTime}"}"""
  }

  /** Wrap events as kafka records on `orders.events` (6 partitions, keyed
    * by order_id — deploy/kafka/init-topics.sh:8): partition =
    * hash(order_id) mod partitions, offsets dense per partition in input
    * order, kafka_timestamp supplied by the caller (lets tests model
    * out-of-order and duplicate delivery).
    */
  def kafkaRecords(events: Seq[(OrderCreated, Timestamp)],
                   topic: String = "orders.events",
                   partitions: Int = 6,
                   baseOffset: Long = 0L): Seq[KafkaRecord] = {
    val counters = scala.collection.mutable.Map.empty[Int, Long]
    events.map { case (e, ts) =>
      val p = math.floorMod(e.orderId.hashCode, partitions)
      val off = counters.getOrElse(p, baseOffset)
      counters(p) = off + 1
      KafkaRecord(
        key = e.orderId.getBytes(UTF_8),
        value = orderCreatedJson(e).getBytes(UTF_8),
        topic = topic, partition = p, offset = off,
        timestamp = ts, timestampType = 0)
    }
  }
}
