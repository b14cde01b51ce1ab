package graft.lake

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Catalog registration + event_date partition layout: queries through the
  * catalog must prune partitions at the scan (SURVEY §4 row 6).
  */
class CatalogSpec extends SparkSpec {

  test("partitioned saveAsTable: catalog read prunes by event_date") {
    val dir = Files.createTempDirectory("graft-cat").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"), col("event_date"))
    Catalog.writePartitionedTable(spark, ev, "bronze_raw.events_raw",
      s"$dir/events_raw", "event_date")

    val day = ev.select(min(col("event_date"))).head.getDate(0)
    val q = spark.table("bronze_raw.events_raw")
      .filter(col("event_date") === day)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"),
      s"expected non-empty PartitionFilters in:\n$plan")
    assert(q.count() == ev.filter(col("event_date") === day).count())
    spark.sql("DROP TABLE bronze_raw.events_raw")
  }

  test("registerExternal discovers partitions of an existing layout") {
    val dir = Files.createTempDirectory("graft-ext").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"), col("event_date"))
    ev.write.partitionBy("event_date").parquet(s"$dir/t")
    Catalog.registerExternal(spark, "bronze_raw.events_ext", s"$dir/t")
    assert(spark.table("bronze_raw.events_ext").count() == ev.count())
    spark.sql("DROP TABLE bronze_raw.events_ext")
  }

  test("bucketed tables join without any exchange (co-located join)") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    Catalog.writeBucketedTable(spark, orders, "bronze_raw.orders_b",
      "o_orderkey", 8)
    Catalog.writeBucketedTable(spark,
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "bronze_raw.lineitem_b", "o_orderkey", 8)
    // broadcast off: the join must be co-located via bucket layout, not
    // saved by a broadcast of the small test data
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bronze_raw.orders_b")
        .join(spark.table("bronze_raw.lineitem_b"), "o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(j.count() == orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE bronze_raw.orders_b")
      spark.sql("DROP TABLE bronze_raw.lineitem_b")
    }
  }

  test("mergeIntoPath survives a crash between rename-aside and swap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-crash").toString
    val path = s"$dir/t"
    val v1 = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "ver", "v")
    Upsert.mergeIntoPath(spark, path, v1, Seq("k"), Seq("ver"))
    assert(spark.read.parquet(path).count() == 2)
    // simulate the crash window: live table renamed aside, swap not done
    java.nio.file.Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(path + ".__old"))
    val v2 = Seq((2L, 20L, "b2"), (3L, 20L, "c")).toDF("k", "ver", "v")
    Upsert.mergeIntoPath(spark, path, v2, Seq("k"), Seq("ver"))
    val rows = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows == Map(1L -> "a", 2L -> "b2", 3L -> "c"),
      "recovery must restore the renamed-aside table before merging")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".__old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".__tmp")))
  }
}
