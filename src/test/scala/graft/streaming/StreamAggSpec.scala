package graft.streaming

import graft.SparkSpec
import graft.ml.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

case class SEv(user_id: Long, event_ts: Timestamp)
case class HEv(user_id: Long)

/** Streaming aggregation semantics beyond the silver/gold specs: native
  * session windows under a watermark (finalized sessions match the batch
  * sessionization), and the HLL register shape as a BOUNDED-STATE
  * streaming distinct count (state = m rows regardless of stream length
  * — the sketch-family claim, live under Structured Streaming).
  */
class StreamAggSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming session_window finalizes sessions that equal the batch result") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SEv]
    val sessions = input.toDF()
      .withWatermark("event_ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("event_ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("graft_sess")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val evs = Seq(
      SEv(1L, ts("2024-01-01 01:00:00")), SEv(1L, ts("2024-01-01 01:02:00")),
      SEv(1L, ts("2024-01-01 01:04:00")), // one session (gaps < 5 min)
      SEv(1L, ts("2024-01-01 01:20:00")), // second session
      SEv(2L, ts("2024-01-01 01:03:00")),
      SEv(2L, ts("2024-01-01 01:07:59"))) // still one session (4:59 gap)
    input.addData(evs)
    q.processAllAvailable()
    // watermark-advancing flush: a much later event finalizes the above
    input.addData(Seq(SEv(99L, ts("2024-01-01 03:00:00"))))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_sess")
      .filter(col("user_id") =!= 99L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // batch reference: the SAME session_window aggregation, plus a
    // cross-check against the window-based batch sessionizer
    val batch = evs.toDF()
      .groupBy(col("user_id"), session_window(col("event_ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(streamed == Set(
      (1L, ts("2024-01-01 01:00:00"), 3L),
      (1L, ts("2024-01-01 01:20:00"), 1L),
      (2L, ts("2024-01-01 01:03:00"), 2L)))
    val viaSessionize = graft.operators.Temporal.sessionizeAgg(
        evs.toDF().withColumn("ts_us", expr("unix_micros(event_ts)")),
        Seq("user_id"), "ts_us", Seq("ts_us"), 300000000L)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_start"), r.getAs[Long]("n_events"))).toSet
    assert(viaSessionize == streamed.map { case (u, st, n) =>
      (u, st.getTime * 1000L, n) },
      "native session_window and the window-based sessionizer disagree")
  }

  test("streaming HLL: m-row state, estimates match batch at every point") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[HEv]
    val regs = Sketches.hllRegisters(input.toDF(), Seq.empty, col("user_id"), 6)
    val q = regs.writeStream.format("memory").queryName("graft_hll")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()

    def streamedEstimate(): Long =
      Sketches.hllEstimate(spark.table("graft_hll"), Seq.empty, 6)
        .collect().head.getLong(0)
    def batchEstimate(upTo: Int): Long =
      Sketches.hllDistinct((0 until upTo).map(i => HEv(i.toLong)).toDF(),
        Seq.empty, col("user_id"), 6).collect().head.getLong(0)

    input.addData((0 until 800).map(i => HEv(i.toLong)))
    q.processAllAvailable()
    assert(streamedEstimate() == batchEstimate(800),
      "streamed registers must equal the batch sketch after wave 1")
    // wave 2 overlaps wave 1 (dup users) and extends it
    input.addData((400 until 2000).map(i => HEv(i.toLong)))
    q.processAllAvailable()
    assert(streamedEstimate() == batchEstimate(2000),
      "streamed registers must equal the batch sketch after wave 2")
    assert(spark.table("graft_hll").count() <= 64,
      "streaming state must be bounded by m registers")
    q.stop()
  }
}
