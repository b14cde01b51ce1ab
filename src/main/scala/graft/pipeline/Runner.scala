package graft.pipeline

import graft.lake.{Catalog, Upsert}
import graft.quality.Checks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-call medallion pipeline over the event stream table — the
  * operational composition SURVEY §3 maps out (BronzeIngest → SilverJobs →
  * GoldBuild, orchestration as function composition, not Airflow):
  *
  *  1. bronze: envelope projection, written partitioned by event_date and
  *     registered in the catalog;
  *  2. silver: latest-wins dedup by event_id, durably merged (idempotent,
  *     crash-safe swap);
  *  3. gold: minute-bucketed sales fact, merged by bucket;
  *  4. quality gate: the reference's dbt schema tests on the gold output.
  *
  * Rerunning is a no-op by construction (every layer is an idempotent
  * merge) — the property the reference gets from Delta MERGE + dedup.
  */
object Runner {

  case class GoldResult(gold: DataFrame, qualityFailures: Seq[String])

  def run(spark: SparkSession, events: DataFrame, baseDir: String): GoldResult = {
    // bronze: raw capture, partitioned for day-range pruning
    val bronze = Medallion.bronzeProject(events)
    Catalog.writePartitionedTable(spark, bronze, "bronze_raw.events_raw",
      s"$baseDir/bronze/events_raw", "event_date")

    // silver: one row per event_id, latest delivery wins. Dedup the event
    // side FIRST and use bronze only as a landed-set gate (semi-join) —
    // joining raw bronze to raw events on event_id would cross-multiply
    // duplicate deliveries and could stitch fields from different
    // deliveries into a row that never existed.
    val eventsLatest = Upsert.latestWins(
      events.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("event_ts"), col("event_ts_us"), col("event_date")),
      keys = Seq("event_id"), ordering = Seq("event_ts_us", "event_id"))
    val silverSrc = eventsLatest.join(
      spark.table("bronze_raw.events_raw").select(col("event_id")),
      Seq("event_id"), "left_semi")
    Upsert.mergeIntoPath(spark, s"$baseDir/silver/events_clean", silverSrc,
      keys = Seq("event_id"), ordering = Seq("event_ts_us", "event_id"))
    val silver = spark.read.parquet(s"$baseDir/silver/events_clean")

    // gold: incremental minute fact, merged on the bucket key
    val fct = Medallion.salesMinute(silver)
    Upsert.mergeIntoPath(spark, s"$baseDir/gold/fct_sales_minute", fct,
      keys = Seq("minute_bucket_us"), ordering = Seq("minute_bucket_us"))
    val gold = spark.read.parquet(s"$baseDir/gold/fct_sales_minute")

    // the reference's schema tests (models/gold/schema.yml:4-20)
    val failures = Seq(
      Checks.notNull(gold, "minute_bucket_us"),
      Checks.unique(gold, "minute_bucket_us"),
      Checks.notNull(gold, "gmv"),
      Checks.notNull(gold, "paid_orders"))
      .collect { case Left(err) => err }
    GoldResult(gold, failures)
  }
}
