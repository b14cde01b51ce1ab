package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names (dev iteration aid).
    // Surrounding [brackets] are tolerated — the docs render the arg as
    // [q24,q25] and a literal paste of that must select q24 and q25, not
    // silently match nothing.
    val only: Set[String] =
      if (args.length > 2)
        args(2).stripPrefix("[").stripSuffix("]").split(",").toSet
      else Set.empty
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    if (only.nonEmpty)
      System.err.println(
        s"[verify] selective run (${only.mkString(",")}): other query dirs in " +
        s"$outDir are STALE leftovers from prior runs — oracle_check honors " +
        "the manifest written by this run and skips them.")
    // A selector matches its full query name or the `qNN` shorthand
    // (`q24` → `q24_neardup_pairs`) — exact-only matching silently
    // selected NOTHING for a pasted short name.
    def selected(name: String): Boolean =
      only.isEmpty || only(name) ||
        only.exists(o => name.startsWith(o + "_"))
    val unmatched = only.filterNot(o =>
      SparkEntry.queries.keys.exists(n => n == o || n.startsWith(o + "_")))
    if (unmatched.nonEmpty)
      System.err.println(
        s"[verify] WARNING: selectors match no query: ${unmatched.mkString(",")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json and the manifest are written UP FRONT, before the
    // long query loop: a run killed mid-way (driver timeout, OOM) then
    // still leaves the full oracle SQL plus the attempted-query manifest
    // on disk, so the correctness gate reports loud per-query ERRORs for
    // the missing dirs instead of silently producing an empty artifact
    // (the round-18 `{}` failure mode).
    locally {
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
      val ran = SparkEntry.queries.keys.filter(selected).toSeq.sorted
      Files.writeString(Paths.get(s"$outDir/verify_manifest.json"),
        ran.map(q).mkString("[", ",", "]"))
    }
    SparkEntry.queries
      .filter { case (name, _) => selected(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Drop any previous/partial output for this query recursively
        // (a failed write can leave a _temporary subtree) — a stale or
        // partial result must not masquerade as this run's answer.
        def rmRf(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rmRf)
          f.delete(); ()
        }
        val dir = new java.io.File(s"$outDir/$name")
        if (dir.exists()) rmRf(dir)
      }
      // Release persisted intermediates between queries — the CacheManager
      // otherwise holds every operator's cached plan for the whole run.
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
