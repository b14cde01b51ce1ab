package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import java.nio.file.Files

/** End-to-end medallion composition: bronze→silver→gold lands the same
  * fact as the direct query, quality gates pass, rerun is a no-op.
  */
class RunnerSpec extends SparkSpec {

  test("bronze→silver→gold equals the direct gold query; rerun is idempotent") {
    val dir = Files.createTempDirectory("graft-runner").toString
    val events = Tables.events(spark, sfDir)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val r1 = Runner.run(spark, events, dir)
    assert(r1.qualityFailures.isEmpty, r1.qualityFailures.mkString("; "))
    // materialize before the rerun: the atomic swap replaces the files a
    // lazy reader has already listed
    val gold1 = canon(r1.gold)
    assert(gold1 == canon(Medallion.salesMinute(events)),
      "pipeline gold must equal the direct aggregation")
    val r2 = Runner.run(spark, events, dir)
    assert(canon(r2.gold) == gold1, "rerun must be a no-op")
  }

  test("bronze accumulates across runs; a crashed-looking rerun stays consistent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-runner2").toString
    def ev(id: Long, v: Double, ts: String) = {
      val t = java.sql.Timestamp.valueOf(ts)
      (id, id % 3, "purchase", v, t, t.getTime * 1000L, new java.sql.Date(t.getTime))
    }
    val batch1 = Seq(ev(1, 10.0, "2024-01-01 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "event_ts", "event_ts_us", "event_date")
    val batch2 = Seq(ev(1, 10.0, "2024-01-01 01:00:00"),   // replay
                     ev(2, 20.0, "2024-01-01 01:01:00"))
      .toDF("event_id", "user_id", "event_type", "value", "event_ts", "event_ts_us", "event_date")
    Runner.run(spark, batch1, dir)
    val r2 = Runner.run(spark, batch2, dir)
    assert(spark.read.parquet(s"$dir/bronze/events_raw").count() == 2,
      "bronze must accumulate distinct deliveries and collapse replays")
    assert(r2.qualityFailures.isEmpty)
    assert(spark.read.parquet(r2.goldPath)
      .agg(org.apache.spark.sql.functions.sum("gmv")).head.getDouble(0) == 30.0)
  }
}
