package graft.pipeline

import graft.SparkSpec
import graft.lake.DeltaLog
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Durable CDF-consumer contracts: the view equals a recompute after
  * every refresh, replays are no-ops (txn watermark), and a consumer
  * attaching late folds the whole history to the same state.
  */
class CdfViewSpec extends SparkSpec {
  import spark.implicits._

  private val CDF = Map("delta.enableChangeDataFeed" -> "true")

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft-cdfview-$name").toString

  private def state(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap

  test("view tracks source through DML; replay is a no-op") {
    val base = fresh("a")
    val (src, dir) = (s"$base/src", s"$base/view")
    DeltaLog.commitFlat(spark, src,
      Seq(("x", 1L, 1.10), ("x", 2L, 2.20), ("y", 3L, 3.00))
        .toDF("g", "id", "v"), configuration = CDF)
    val v1 = state(CdfView.refreshDurable(spark, dir, src, Seq("g"), "v"))
    assert(v1 == Map("x" -> ((2L, 330L)), "y" -> ((1L, 300L))), v1)
    // DML on the source: delete one x row, double y's value
    DeltaLog.deleteWhereLong(spark, src, "id", 2L, 2L)
    DeltaLog.updateWhereLong(spark, src, "id", 3L, 3L,
      Map("v" -> (col("v") * 2)))
    val v2 = state(CdfView.refreshDurable(spark, dir, src, Seq("g"), "v"))
    assert(v2 == Map("x" -> ((1L, 110L)), "y" -> ((1L, 600L))), v2)
    // caught up: replaying the refresh changes nothing, commits nothing
    val viewVersion = DeltaLog.currentVersion(dir)
    val v3 = state(CdfView.refreshDurable(spark, dir, src, Seq("g"), "v"))
    assert(v3 == v2 && DeltaLog.currentVersion(dir) == viewVersion)
  }

  test("a consumer attaching after the full history folds to the same " +
    "state; groups deleted to zero disappear") {
    val base = fresh("b")
    val (src, d1, d2) = (s"$base/src", s"$base/v1", s"$base/v2")
    DeltaLog.commitFlat(spark, src,
      Seq(("x", 1L, 5.00), ("z", 2L, 7.00)).toDF("g", "id", "v"),
      configuration = CDF)
    // incremental consumer follows along
    CdfView.refreshDurable(spark, d1, src, Seq("g"), "v")
    DeltaLog.deleteWhereLong(spark, src, "id", 2L, 2L) // z folds to absence
    DeltaLog.commitFlat(spark, src, Seq(("x", 4L, 1.00)).toDF("g", "id", "v"))
    val incr = state(CdfView.refreshDurable(spark, d1, src, Seq("g"), "v"))
    // late consumer folds everything at once
    val late = state(CdfView.refreshDurable(spark, d2, src, Seq("g"), "v"))
    assert(incr == Map("x" -> ((2L, 600L))), incr)
    assert(late == incr)
  }
}
