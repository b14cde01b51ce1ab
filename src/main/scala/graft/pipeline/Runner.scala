package graft.pipeline

import graft.lake.Upsert
import graft.quality.Checks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-call medallion pipeline over the event stream table — the
  * operational composition SURVEY §3 maps out (BronzeIngest → SilverJobs →
  * GoldBuild, orchestration as function composition, not Airflow). Every
  * layer is a crash-safe idempotent merge, so a rerun — and a rerun after
  * a mid-pipeline crash — is a no-op:
  *
  *  1. bronze: idempotent raw landing — deliveries keyed by their full
  *     identity (event_id, event_ts_us, value), so distinct deliveries
  *     accumulate and exact replays collapse (exactly-once landing);
  *  2. silver: latest-wins by event_id over bronze (payload and event_id
  *     break timestamp ties deterministically);
  *  3. gold: minute-bucketed sales fact, merged by bucket;
  *  4. quality gate: the reference's dbt schema tests on the gold output.
  */
object Runner {

  /** `gold` is read fresh from `goldPath`; NOTE a subsequent run() swaps
    * the directory under any still-lazy reader, so materialize (or
    * re-read from `goldPath`) before rerunning.
    */
  case class GoldResult(gold: DataFrame, goldPath: String,
                        qualityFailures: Seq[String])

  def run(spark: SparkSession, events: DataFrame, baseDir: String): GoldResult = {
    // bronze: raw capture, accumulated across runs, crash-safe
    val bronzePath = s"$baseDir/bronze/events_raw"
    Upsert.mergeIntoPath(spark, bronzePath,
      events.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("event_ts"), col("event_ts_us"), col("event_date")),
      keys = Seq("event_id", "event_ts_us", "value"),
      ordering = Seq("event_ts_us"))

    // silver: one row per event_id, latest delivery wins; value is the
    // deterministic tiebreaker for equal-timestamp deliveries
    val silverPath = s"$baseDir/silver/events_clean"
    Upsert.mergeIntoPath(spark, silverPath, spark.read.parquet(bronzePath),
      keys = Seq("event_id"), ordering = Seq("event_ts_us", "value"))

    // gold: incremental minute fact, merged on the bucket key
    val goldPath = s"$baseDir/gold/fct_sales_minute"
    val fct = Medallion.salesMinute(spark.read.parquet(silverPath))
    Upsert.mergeIntoPath(spark, goldPath, fct,
      keys = Seq("minute_bucket_us"), ordering = Seq("minute_bucket_us"))
    val gold = spark.read.parquet(goldPath)

    // the reference's schema tests (models/gold/schema.yml:4-20)
    val failures = Seq(
      Checks.notNull(gold, "minute_bucket_us"),
      Checks.unique(gold, "minute_bucket_us"),
      Checks.notNull(gold, "gmv"),
      Checks.notNull(gold, "paid_orders"))
      .collect { case Left(err) => err }
    GoldResult(gold, goldPath, failures)
  }
}
