package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Change-data-feed contracts (PROTOCOL.md: Add CDC File): DML on a
  * `delta.enableChangeDataFeed=true` table records row-level changes in
  * `_change_data/` CDC files referenced by `cdc` actions; the reader
  * returns exactly those for cdc-carrying commits and SYNTHESIZES blind
  * appends / whole-file deletes; refusals are loud and specific.
  */
class CdfSpec extends SparkSpec {
  import spark.implicits._

  private val CDF = Map("delta.enableChangeDataFeed" -> "true")

  private def freshRoot(): String =
    Files.createTempDirectory("graft-cdf").toString + "/tbl"

  private def commitLines(root: String, v: Long): Seq[String] =
    Files.readAllLines(Paths.get(root, "_delta_log", f"$v%020d.json"))
      .asScala.toSeq.filter(_.trim.nonEmpty)

  private def feed(root: String,
                   since: Long = -1L): Set[(Long, Long, String, Long)] =
    DeltaLog.readChangeFeed(spark, root, since)
      .select(col("k"), col("x"), col("_change_type"),
        col("_commit_version"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet

  test("insert / update pre+post / delete / append round-trip, flat table") {
    val root = freshRoot()
    val base = (1L to 6L).map(k => (k, k * 10L)).toDF("k", "x")
    assert(DeltaLog.commitFlat(spark, root, base, configuration = CDF) == 0L)
    // CDF is a legacy writer-version-4 feature: creation must declare it
    assert(commitLines(root, 0L)
      .exists(_.contains("\"minWriterVersion\":4")))
    assert(DeltaLog.updateWhereLong(spark, root, "k", 2L, 3L,
      Map("x" -> (col("x") + 1L))) == 1L)
    assert(DeltaLog.deleteWhereLong(spark, root, "k", 5L, 5L) == 2L)
    DeltaLog.commitFlat(spark, root, Seq((7L, 70L)).toDF("k", "x"))
    // update and delete commits carry cdc actions; the append does not
    assert(commitLines(root, 1L).exists(_.contains("\"cdc\"")))
    assert(commitLines(root, 2L).exists(_.contains("\"cdc\"")))
    assert(!commitLines(root, 3L).exists(_.contains("\"cdc\"")))
    val expected =
      (1L to 6L).map(k => (k, k * 10L, "insert", 0L)).toSet ++
        Set((2L, 20L, "update_preimage", 1L),
          (3L, 30L, "update_preimage", 1L),
          (2L, 21L, "update_postimage", 1L),
          (3L, 31L, "update_postimage", 1L),
          (5L, 50L, "delete", 2L),
          (7L, 70L, "insert", 3L))
    assert(feed(root) == expected)
    // half-open range semantics: (1, 3] sees only delete + append
    assert(feed(root, since = 1L) ==
      Set((5L, 50L, "delete", 2L), (7L, 70L, "insert", 3L)))
    // the snapshot itself is unaffected by CDC bookkeeping
    assert(DeltaLog.read(spark, root).count() == 6L)
  }

  test("refuses tables without delta.enableChangeDataFeed") {
    val root = freshRoot()
    DeltaLog.commitFlat(spark, root, Seq((1L, 10L)).toDF("k", "x"))
    val e = intercept[IllegalArgumentException](
      DeltaLog.readChangeFeed(spark, root, -1L))
    assert(e.getMessage.contains("enableChangeDataFeed"), e.getMessage)
  }

  test("DV delete records CDC; only FRESH positions appear; protocol " +
    "upgrade keeps legacy writer features") {
    val root = freshRoot()
    val base = (1L to 8L).map(k => (k, k * 10L)).toDF("k", "x")
    DeltaLog.commitFlat(spark, root, base, configuration = CDF)
    assert(DeltaLog.deleteWhereLongDV(spark, root, "k", 2L, 4L) == 1L)
    // overlapping second delete: only k=5 is new
    assert(DeltaLog.deleteWhereLongDV(spark, root, "k", 3L, 5L) == 2L)
    assert(feed(root, since = 0L) ==
      Set((2L, 20L, "delete", 1L), (3L, 30L, "delete", 1L),
        (4L, 40L, "delete", 1L), (5L, 50L, "delete", 2L)))
    // the 2→7 upgrade must enumerate what legacy version 4 implied
    val proto = commitLines(root, 1L).find(_.contains("\"protocol\"")).get
    Seq("appendOnly", "invariants", "changeDataFeed", "generatedColumns",
      "deletionVectors").foreach(f => assert(proto.contains(f), proto))
    assert(DeltaLog.read(spark, root)
      .select(col("k")).as[Long].collect().toSet == Set(1L, 6L, 7L, 8L))
  }

  test("partition-column delete synthesizes whole-partition deletes " +
    "(no CDC files, the protocol's derivation rule)") {
    val root = freshRoot()
    val base = (1L to 6L).map(k => (k, k * 10L, k % 2L)).toDF("k", "x", "p")
    DeltaLog.commitPartitioned(spark, root, base, Seq("p"),
      configuration = CDF)
    assert(DeltaLog.deleteWhereLong(spark, root, "p", 1L, 1L) == 1L)
    assert(!commitLines(root, 1L).exists(_.contains("\"cdc\"")))
    val v1 = DeltaLog.readChangeFeed(spark, root, 0L)
      .select(col("k"), col("p"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(v1 == Set((1L, 1L, "delete"), (3L, 1L, "delete"),
      (5L, 1L, "delete")))
  }

  test("vacuum keeps _change_data; cdc-backed tail stays readable") {
    val root = freshRoot()
    val base = (1L to 6L).map(k => (k, k * 10L)).toDF("k", "x")
    DeltaLog.commitFlat(spark, root, base, configuration = CDF)
    DeltaLog.deleteWhereLong(spark, root, "k", 2L, 3L)
    val gone = DeltaLog.vacuum(spark, root)
    assert(gone.nonEmpty, "the rewritten source file should be vacuumed")
    assert(gone.forall(!_.startsWith("_change_data")), gone.mkString(","))
    // the cdc-carrying tail reads without the vacuumed source file
    assert(feed(root, since = 0L) ==
      Set((2L, 20L, "delete", 1L), (3L, 30L, "delete", 1L)))
    // but the v0 insert synthesis needs the vacuumed add file — loud
    val e = intercept[IllegalArgumentException](feed(root))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }
}
