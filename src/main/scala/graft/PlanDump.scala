package graft

import java.nio.file.{Files, Paths}

/** Dev aid: dump `explain("formatted")` for named queries to files —
  * the plan evidence the optimization rounds commit under plans/rNN.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> q94 q101 ...
  * Writes <outDir>/<query>_<suffix>.txt (analyzed-time formatted plan,
  * AQE initial — the shape evidence: exchanges, join strategies,
  * PushedFilters/ReadSchema).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = GraftSession.local("graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val full = SparkEntry.queries.keys
        .find(k => k == n || k.startsWith(n + "_"))
        .getOrElse(sys.error(s"no query matches $n"))
      val df = SparkEntry.queries(full)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${full}_$suffix.txt"), txt)
      System.err.println(s"[plandump] wrote $full ($suffix)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
