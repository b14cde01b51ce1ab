package graft

import org.apache.spark.sql.functions._

/** Dev aid: split a query's wall time into driver-side query planning
  * (build + analysis/optimization/physical-planning, via
  * QueryPlanningTracker) and execution — locates queries whose cost is
  * Catalyst walking a giant expression tree rather than any Spark job
  * (guide §7.3: "nothing is running" time). Runs each named query N
  * times on the SAME session, like Bench.
  *
  * Usage: runMain graft.PhaseProbe <sfDir> <runs> q83 q82 ...
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.local("graft-phaseprobe")
    names.foreach { n =>
      val full = SparkEntry.queries.keys
        .find(k => k == n || k.startsWith(n + "_"))
        .getOrElse(sys.error(s"no query matches $n"))
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(full)(spark, sfDir)
        val hashed = df.select(
          xxhash64(struct(df.columns.map(col).toSeq: _*)).as("__h"))
          .agg(expr("bit_xor(__h)"))
        val t1 = System.nanoTime()
        hashed.head()
        val t2 = System.nanoTime()
        val ph = hashed.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${v.durationMs}ms" }.mkString(" ")
        System.err.println(
          f"[phase] $full run$i build=${(t1 - t0) / 1e6}%.0fms " +
          f"head=${(t2 - t1) / 1e6}%.0fms $ph")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
