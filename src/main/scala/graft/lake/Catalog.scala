package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog DDL + partitioned-layout writes — the reference's table
  * registration (bronze_orders_raw.py:26-35: CREATE SCHEMA / CREATE TABLE
  * … USING DELTA LOCATION) and its recommended `event_date` partitioning
  * (README.md:295), on plain parquet + the session catalog.
  *
  * Partitioning by event_date is what makes the daily-window queries
  * cheap at 100 TB: the scan's PartitionFilters prune whole directories
  * before any IO (asserted in CatalogSpec).
  */
object Catalog {

  /** CREATE SCHEMA IF NOT EXISTS (S6). */
  def ensureSchema(spark: SparkSession, schema: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $schema")

  /** Write `df` partitioned by `partitionCol` and register it as an
    * external table at `location` — the catalog tracks partitions, so
    * partition pruning works through `spark.table(name)`.
    */
  def writePartitionedTable(spark: SparkSession, df: DataFrame, name: String,
                            location: String, partitionCol: String): Unit = {
    name.split('.').dropRight(1).foreach(ensureSchema(spark, _))
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .option("path", location)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Register an existing partitioned parquet directory as an external
    * table (CREATE TABLE … USING parquet LOCATION) and discover its
    * partitions (MSCK REPAIR — the hive-metastore idiom).
    */
  def registerExternal(spark: SparkSession, name: String, location: String): Unit = {
    name.split('.').dropRight(1).foreach(ensureSchema(spark, _))
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$location'")
    spark.sql(s"MSCK REPAIR TABLE $name")
  }

  /** Write `df` as a BUCKETED managed table: rows are hash-distributed
    * into `buckets` files per partition by `bucketCol` and sorted within
    * each bucket. Two tables bucketed the same way join WITHOUT any
    * exchange — the physical plan reads co-located buckets directly
    * (CatalogSpec asserts the exchange-free join). This is the 100 TB
    * lever for fact-to-fact joins that recur on the same key (orders ⋈
    * order_events, corpus ⋈ dedup-verdicts): the shuffle is paid ONCE at
    * write time instead of on every query.
    *
    * Bucket counts must MATCH across join sides (Spark 4 can coalesce
    * mismatched counts when one divides the other, but identical counts
    * are the portable contract).
    */
  def writeBucketedTable(spark: SparkSession, df: DataFrame, name: String,
                         bucketCol: String, buckets: Int): Unit = {
    require(buckets > 0, s"bucket count must be positive: $buckets")
    name.split('.').dropRight(1).foreach(ensureSchema(spark, _))
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)
  }
}
