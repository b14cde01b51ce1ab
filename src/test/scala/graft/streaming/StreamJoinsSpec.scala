package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class OrderEvt(order_id: Long, order_ts: Timestamp, status: String)
case class PayEvt(payment_id: Long, order_id: Long, pay_ts: Timestamp,
                  amount: Double)

/** Stream-stream interval join + watermarked dedup: cross-validated
  * against the identical batch formulation on out-of-order fixtures, and
  * watermark-eviction behavior (late drops, outer-join null emission)
  * asserted explicitly.
  */
class StreamJoinsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runStream(orders: Seq[Seq[OrderEvt]], pays: Seq[Seq[PayEvt]],
                        joinType: String = "inner"): Set[(Long, Option[Long])] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val oIn = MemoryStream[OrderEvt]
    val pIn = MemoryStream[PayEvt]
    val joined = StreamJoins.paymentAttribution(
      oIn.toDF(), pIn.toDF(), horizon = "1 hour", lateness = "30 minutes",
      joinType = joinType)
    val name = s"sj_${joinType}_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      orders.zipAll(pays, Seq.empty[OrderEvt], Seq.empty[PayEvt]).foreach {
        case (ob, pb) =>
          if (ob.nonEmpty) oIn.addData(ob)
          if (pb.nonEmpty) pIn.addData(pb)
          q.processAllAvailable()
      }
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("order_id"),
        Option(r.getAs[Any]("payment_id")).map(_.asInstanceOf[Long])))
      .toSet
  }

  test("interval join stream equals the batch join on out-of-order delivery") {
    import spark.implicits._
    val orders = Seq(
      OrderEvt(1, ts("2024-01-01 10:00:00"), "created"),
      OrderEvt(2, ts("2024-01-01 10:05:00"), "created"),
      OrderEvt(3, ts("2024-01-01 10:10:00"), "created"))
    val pays = Seq(
      PayEvt(101, 1, ts("2024-01-01 10:20:00"), 10.0), // in horizon
      PayEvt(102, 2, ts("2024-01-01 11:30:00"), 20.0), // past 1 h horizon
      PayEvt(103, 3, ts("2024-01-01 10:11:00"), 30.0), // in horizon
      PayEvt(104, 9, ts("2024-01-01 10:12:00"), 40.0)) // no such order
    // deliver out of order across micro-batches: payments before orders
    val got = runStream(
      Seq(Seq.empty, orders.take(2), orders.drop(2)),
      Seq(pays.take(2), pays.drop(2), Seq.empty))
    val batch = StreamJoins.paymentAttribution(
        orders.toDF(), pays.toDF(), "1 hour", "30 minutes")
      .collect().map(r => (r.getLong(0), Some(r.getAs[Long]("payment_id")))).toSet
    assert(got == batch && got == Set((1L, Some(101L)), (3L, Some(103L))),
      s"stream=$got batch=$batch")
  }

  test("left_outer interval join emits unmatched orders once state expires") {
    // Order 2 never gets a payment; once both watermarks pass its
    // horizon (advanced by the late sentinel batch), it must surface
    // exactly once with a null payment side.
    // The GLOBAL watermark is the min over both streams, and eviction
    // runs in the micro-batch AFTER the watermark advances — so batch 2
    // moves BOTH sides' event time far ahead, and batch 3 delivers one
    // more row to trigger the eviction pass that emits the null match.
    val got = runStream(
      Seq(Seq(OrderEvt(1, ts("2024-01-01 10:00:00"), "created"),
          OrderEvt(2, ts("2024-01-01 10:01:00"), "created")),
        Seq(OrderEvt(998, ts("2024-01-01 14:00:00"), "sentinel")),
        Seq.empty),
      Seq(Seq(PayEvt(101, 1, ts("2024-01-01 10:30:00"), 10.0)),
        Seq(PayEvt(999, 999, ts("2024-01-01 14:00:00"), 0.0)),
        Seq(PayEvt(1000, 999, ts("2024-01-01 14:05:00"), 0.0))),
      joinType = "left_outer")
    assert(got.contains((1L, Some(101L))) && got.contains((2L, None)),
      s"missing match or unmatched-order emission: $got")
    // the sentinel order's own horizon is still inside the watermark —
    // it must NOT have null-emitted yet
    assert(!got.contains((998L, None)), s"premature outer emission: $got")
  }

  test("dedupStream: within-watermark re-deliveries collapse; stream equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[OrderEvt]
    val name = s"dd_${System.nanoTime()}"
    val q = StreamJoins.dedupStream(in.toDF(), Seq("order_id"), "order_ts",
        "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val a = OrderEvt(1, ts("2024-01-01 10:00:00"), "created")
    val b = OrderEvt(2, ts("2024-01-01 10:01:00"), "created")
    try {
      in.addData(Seq(a, b)); q.processAllAvailable()
      // re-delivery of both keys in a later micro-batch, within watermark
      in.addData(Seq(a, b.copy(status = "redelivered"))); q.processAllAvailable()
      in.addData(Seq(OrderEvt(3, ts("2024-01-01 10:02:00"), "created")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect().map(_.getAs[Long]("order_id")).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L), s"dedup violated: ${got.toSeq}")
  }

  test("stream-static enrichment: streaming side joins a static dim, stream equals batch") {
    // The streaming face of the silver enrich (J1): a static dimension
    // needs no watermark and no state — each micro-batch joins the
    // current dim snapshot. Delivered over two batches, result must
    // equal the one-shot batch join.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("order_id", "tier")
    val in = MemoryStream[OrderEvt]
    val name = s"ss_${System.nanoTime()}"
    val q = in.toDF().join(dim, Seq("order_id"), "left")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val evs = Seq(
      OrderEvt(1, ts("2024-01-01 10:00:00"), "created"),
      OrderEvt(2, ts("2024-01-01 10:01:00"), "created"),
      OrderEvt(3, ts("2024-01-01 10:02:00"), "created"))
    try {
      in.addData(evs.take(1)); q.processAllAvailable()
      in.addData(evs.drop(1)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => r.getAs[Long]("order_id") -> Option(r.getAs[String]("tier"))).toMap
    val batch = evs.toDF().join(dim, Seq("order_id"), "left").collect()
      .map(r => r.getAs[Long]("order_id") -> Option(r.getAs[String]("tier"))).toMap
    assert(got == batch &&
      got == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
  }

  test("dedupStream requires keys; state horizon documented by eviction") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      StreamJoins.dedupStream(
        Seq(OrderEvt(1, ts("2024-01-01 10:00:00"), "x")).toDF(),
        Seq.empty, "order_ts", "10 minutes")
    }
  }
}
