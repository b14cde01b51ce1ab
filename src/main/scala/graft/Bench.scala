package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Each query is forced with a count() (no collect of full results).
  */
object Bench {

  /** Headline set — the queries that exercise the scan/shuffle/join paths
    * that dominate at scale. Brute-force O(n²) variants are excluded here
    * (their LSH-bucketed versions are the scale path).
    */
  val headline: Seq[String] = Seq(
    "q01_bronze_project", "q02_dedup_latest", "q04_user_spend", "q05_enrich",
    "q07_fct_sales_minute", "q10_upsert_idempotent", "q13_pricing_summary",
    "q14_revenue_by_region", "q15_top_customers", "q16_running_spend",
    "q19_event_pivot", "q21_minute_spine", "q22_hash_keys",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    val qs = SparkEntry.queries
    val names = headline.filter(qs.contains) ++
      qs.keys.filterNot(headline.contains).toSeq.sorted
    // Warm the JVM/codegen/file-listing paths once on the smallest table so
    // the timed numbers measure the queries, not first-use setup.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { qs(name)(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qjson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
