package graft.lake

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The co-located-join plan contract: joining two same-bucketed tables
  * produces ZERO shuffle exchanges even with broadcast disabled — the
  * layout, not the optimizer, provides the partitioning.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-bucketed join plans with no exchange; rows match plain join") {
    val base = Files.createTempDirectory("graft-bucket").toString
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "bspec_orders", s"$base/o",
      "o_orderkey", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(li, "bspec_lineitem", s"$base/l",
      "o_orderkey", 8, Seq("o_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bspec_orders",
        "bspec_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a merge/hash join:\n$plan")
      // identical rows to the plain (shuffling) join
      val expected = orders.join(li, Seq("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bspec_orders")
      spark.sql("DROP TABLE IF EXISTS bspec_lineitem")
    }
  }

  test("mismatched bucket counts still answer correctly (plan may shuffle)") {
    val base = Files.createTempDirectory("graft-bucket2").toString
    val a = Tables.orders(spark, sfDir).select(col("o_orderkey"))
    Bucketing.writeBucketed(a, "bspec_a", s"$base/a", "o_orderkey", 4)
    Bucketing.writeBucketed(a, "bspec_b", s"$base/b", "o_orderkey", 6)
    try {
      val n = Bucketing.bucketedJoin(spark, "bspec_a", "bspec_b",
        "o_orderkey").count()
      assert(n == a.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_a")
      spark.sql("DROP TABLE IF EXISTS bspec_b")
    }
  }
}
