package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Stateful order lifecycle: monotone transitions under duplicates and
  * out-of-order/replayed deliveries, across micro-batch boundaries.
  */
class OrderStateMachineSpec extends SparkSpec {
  import OrderStateMachine._

  test("pure transition: monotone stages, duplicates and regressions ignored") {
    val (s1, out1) = transition(OrderState(0, 0L), Iterator(
      OrderEvent("o1", "order.created", 10L),
      OrderEvent("o1", "payment.succeeded", 20L),
      OrderEvent("o1", "order.created", 30L)), "o1")  // late replay: ignored
    assert(s1 == OrderState(2, 20L))
    assert(out1.map(_.status) == Seq("PENDING_PAYMENT", "READY_TO_SHIP"))
    val (s2, out2) = transition(s1, Iterator(
      OrderEvent("o1", "payment.succeeded", 21L),     // duplicate stage
      OrderEvent("o1", "shipping.dispatched", 40L)), "o1")
    assert(s2.stage == 3 && out2.map(_.status) == Seq("DISPATCHED"))
    assert(transition(s2, Iterator(OrderEvent("o1", "unknown.event", 50L)), "o1")
      ._2.isEmpty, "unknown event types are ignored")
  }

  test("streaming flatMapGroupsWithState emits one record per accepted transition") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[OrderEvent]
    val q = OrderStateMachine.run(input.toDS(), timeoutMs = 0)
      .writeStream.format("memory").queryName("order_states")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData(Seq(
      OrderEvent("a", "order.created", 100L),
      OrderEvent("b", "payment.succeeded", 110L),     // out-of-order: b's created arrives later
      OrderEvent("a", "payment.succeeded", 120L)))
    q.processAllAvailable()
    input.addData(Seq(
      OrderEvent("b", "order.created", 90L),          // late + lower stage: ignored
      OrderEvent("a", "shipping.dispatched", 130L),
      OrderEvent("a", "shipping.dispatched", 130L)))  // duplicate delivery
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("order_states").as[StatusChange].collect()
    val a = rows.filter(_.order_id == "a").sortBy(_.stage).map(_.status).toSeq
    assert(a == Seq("PENDING_PAYMENT", "READY_TO_SHIP", "DISPATCHED"))
    val b = rows.filter(_.order_id == "b").map(_.status).toSeq
    assert(b == Seq("READY_TO_SHIP"),
      s"late lower-stage replay must not regress or duplicate: $b")
  }
}
