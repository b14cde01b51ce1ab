package graft.streaming

import graft.SparkSpec
import graft.ml.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming HLL distinct: bounded state, per-batch refreshed estimates,
  * and BIT-FOR-BIT parity with the batch estimator — the contract that
  * lets a streaming dashboard and its batch backfill agree exactly.
  */
class StreamSketchSpec extends SparkSpec {

  import StreamSketch._

  test("streamed estimates equal the batch estimator on the same rows") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[ValueEvent]
    val q = StreamSketch.run(input.toDS(), p = 8, timeoutMs = 0)
      .writeStream.format("memory").queryName("sketch_out")
      .outputMode(OutputMode.Update()).start()
    try {
      // two batches, overlapping values across batches and groups
      input.addData((1 to 300).map(i => ValueEvent("a", s"u${i % 120}")): _*)
      q.processAllAvailable()
      input.addData((1 to 200).map(i => ValueEvent("a", s"u${100 + i}")) ++
        (1 to 50).map(i => ValueEvent("b", s"v$i")): _*)
      q.processAllAvailable()
      // last emission per group
      val got = spark.table("sketch_out")
        .groupBy(col("group"))
        .agg(last(col("est_distinct")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // batch reference over the SAME logical rows
      val batchRows = ((1 to 300).map(i => ("a", s"u${i % 120}")) ++
        (1 to 200).map(i => ("a", s"u${100 + i}")) ++
        (1 to 50).map(i => ("b", s"v$i"))).toDF("group", "value")
      val ref = Sketches.hllEstimateCorrected(
          Sketches.hllRegisters(batchRows, Seq("group"), col("value"), 8),
          Seq("group"), 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == ref, s"stream $got vs batch $ref")
      // sanity: group a has 120 + 200 distinct (u101..u119 overlap):
      // exact = 120 + 200 - 19 = 301; estimate within HLL error
      assert(math.abs(got("a") - 301L) < 80, s"a: ${got("a")}")
      assert(math.abs(got("b") - 50L) < 15, s"b: ${got("b")}")
    } finally q.stop()
  }

  test("register fold is order- and batching-independent") {
    val vals = (1 to 500).map(i => s"x${i % 97}")
    val a = new Array[Byte](256)
    merge(a, vals.iterator, 8)
    val b = new Array[Byte](256)
    vals.grouped(13).foreach(g => merge(b, g.reverseIterator, 8))
    assert(a.sameElements(b))
    assert(estimate(a, 8) == estimate(b, 8))
  }
}
