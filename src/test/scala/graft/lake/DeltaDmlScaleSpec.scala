package graft.lake

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import java.nio.file.Files

/** 100 TB-posture contracts for the Delta DML WRITE path: wide
  * copy-on-write DML runs a BOUNDED number of Spark jobs (one probe +
  * one rewrite), never one job per touched file; a bulk MERGE's insert
  * set lands as multiple target-sized files in one job; DV deletes
  * build their bitmaps executor-side (the driver handles bitmap bytes,
  * never row positions).
  */
class DeltaDmlScaleSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-dml-scale").toString + "/tbl"

  /** Flush the listener bus so every posted job-start is counted
    * (bytecode-public `listenerBus.waitUntilEmpty`, Scala
    * private[spark] — reflection, the SerializableConfiguration trick).
    */
  private def flushListeners(): Unit = {
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethods.find(_.getName == "listenerBus")
      .get.invoke(sc)
    bus.getClass.getMethods
      .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
      .map(_.invoke(bus))
      .getOrElse {
        val m = bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 1)
          .get
        m.invoke(bus, java.lang.Long.valueOf(30000L))
      }
  }

  private def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { body; flushListeners() }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  test("a DELETE touching 64 files runs a bounded job count " +
    "(one probe + one rewrite), not O(touched files)") {
    val root = freshRoot()
    DeltaLog.commitFlat(spark, root,
      (1L to 6400L).map(k => (k, k % 7)).toDF("k", "x").repartition(64))
    assert(DeltaLog.filesAt(spark, root, 0L).size == 64)
    val jobs = countJobs {
      DeltaLog.deleteWhereLong(spark, root, "k", 1L, 6399L)
    }
    assert(jobs <= 10, s"wide delete ran $jobs jobs — O(files) regression")
    assert(DeltaLog.read(spark, root).select("k").as[Long].collect()
      .toSeq == Seq(6400L))
  }

  test("an UPDATE touching 64 files runs a bounded job count and " +
    "rewrites every touched file") {
    val root = freshRoot()
    DeltaLog.commitFlat(spark, root,
      (1L to 6400L).map(k => (k, k % 7)).toDF("k", "x").repartition(64))
    val jobs = countJobs {
      DeltaLog.updateWhereLong(spark, root, "k", 1L, 6400L,
        Map("x" -> lit(-1L)))
    }
    assert(jobs <= 10, s"wide update ran $jobs jobs — O(files) regression")
    val got = DeltaLog.read(spark, root)
    assert(got.count() == 6400L)
    assert(got.filter(col("x") =!= -1L).count() == 0L)
  }

  test("a bulk MERGE lands its insert set as multiple target-sized " +
    "files in one commit; rewrite survivors intact") {
    val root = freshRoot()
    DeltaLog.commitFlat(spark, root,
      (1L to 100L).map(k => (k, k)).toDF("k", "x").coalesce(1))
    val saved = DeltaLog.mergeInsertRowsPerFile
    try {
      DeltaLog.mergeInsertRowsPerFile = 1000L
      DeltaLog.mergeLongKey(spark, root, "k",
        (50L to 4049L).map(k => (k, -k)).toDF("k", "x"))
    } finally DeltaLog.mergeInsertRowsPerFile = saved
    // 4 000 source rows at 1 000/file = 4 insert files + the rewritten
    // survivor file (rows 1..49)
    val active = DeltaLog.filesAt(spark, root, 1L)
    assert(active.size == 5, s"expected 5 active files, got ${active.size}")
    val got = DeltaLog.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got.size == 4049)
    assert((1L to 49L).forall(k => got(k) == k), "survivors changed")
    assert((50L to 4049L).forall(k => got(k) == -k), "merged rows wrong")
  }

  test("BitmapAgg: DV bitmaps build executor-side — the driver row is " +
    "BINARY bitmap bytes that deserialize to the full position set") {
    val agg = udaf(DeltaLog.BitmapAgg,
      org.apache.spark.sql.Encoders.scalaLong)
    val df = spark.range(1000000L).select((col("id") * 2).as("p"))
      .agg(agg(col("p")).as("dv"))
    assert(df.schema.head.dataType == BinaryType,
      "driver must receive bitmap BYTES, not positions")
    val ps = Dv.deserialize(df.collect().head.getAs[Array[Byte]](0))
    assert(ps.cardinality == 1000000L)
    assert(ps.contains(1999998L) && !ps.contains(1L))
  }

  test("DV delete of a MILLION rows: bitmap-sized driver state, " +
    "correct read-back, cardinality recorded") {
    val root = freshRoot()
    DeltaLog.commitFlat(spark, root,
      spark.range(1100000L).select(col("id").as("k"),
        (col("id") % 10L).as("x")))
    DeltaLog.deleteWhereLongDV(spark, root, "k", 0L, 999999L)
    assert(DeltaLog.read(spark, root).count() == 100000L)
    assert(DeltaLog.read(spark, root).agg(min(col("k"))).head().getLong(0)
      == 1000000L)
    // per-file DVs: descriptor cardinalities across the commit sum to
    // the full million
    val c1 = Files.readAllLines(
      java.nio.file.Paths.get(root, "_delta_log",
        f"${1L}%020d.json")).toString
    val total = """"cardinality":(\d+)""".r
      .findAllMatchIn(c1).map(_.group(1).toLong).sum
    assert(total == 1000000L, s"DV cardinalities sum to $total: ${c1.take(600)}")
  }
}
