package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Delta-protocol interop contracts: sync writes a log an external Delta
  * reader could open (protocol/metaData/add/remove JSON actions, 0-based
  * commits, removes on rewrite, metaData re-emitted only on schema
  * change), and the reader replays externally-written checkpointless
  * logs (unknown actions skipped, URL-encoded paths, last-action-wins,
  * declared schema pinned) while refusing what it can't honor.
  */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-delta").toString + "/tbl"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def commitLines(root: String, v: Long): Seq[String] =
    Files.readAllLines(Paths.get(root, "_delta_log", f"$v%020d.json"))
      .asScala.toSeq.filter(_.trim.nonEmpty)

  test("sync round-trip: delta read matches snapshot read at every version") {
    val root = freshRoot()
    Snapshots.commitAppend(root)(tmp =>
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    Snapshots.commitAppend(root)(tmp =>
      Seq((3L, "c")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    Snapshots.commitRewrite(root)(tmp =>
      Seq((9L, "z")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    val dv = DeltaLog.sync(spark, root)
    assert(dv == 2L, "graft v3 must map to delta commit 2")
    assert(DeltaLog.versions(root) == Seq(0L, 1L, 2L))
    // graft version g ↔ delta version g−1, row-for-row
    (1L to 3L).foreach { g =>
      assert(rows(DeltaLog.readAt(spark, root, g - 1)) ==
        rows(Snapshots.readAt(spark, root, g)), s"version $g")
    }
    assert(rows(DeltaLog.read(spark, root)) == Set((9L, "z")))
  }

  test("commit 0 carries protocol+metaData; rewrite emits removes; appends never do") {
    val root = freshRoot()
    Snapshots.commitAppend(root)(tmp =>
      Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    Snapshots.commitAppend(root)(tmp =>
      Seq((2L, "b")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    Snapshots.commitRewrite(root)(tmp =>
      Seq((3L, "c")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    DeltaLog.sync(spark, root)
    val c0 = commitLines(root, 0L)
    assert(c0.exists(_.contains("\"protocol\"")), c0.mkString("|"))
    assert(c0.exists(_.contains("\"minReaderVersion\":1")), c0.mkString("|"))
    assert(c0.exists(_.contains("\"metaData\"")), c0.mkString("|"))
    assert(c0.exists(_.contains("\"schemaString\"")), c0.mkString("|"))
    assert(c0.count(_.contains("\"add\"")) == 1)
    assert(!c0.exists(_.contains("\"remove\"")))
    // append: one add, no removes, no repeated metaData (schema unchanged)
    val c1 = commitLines(root, 1L)
    assert(c1.count(_.contains("\"add\"")) == 1)
    assert(!c1.exists(_.contains("\"remove\"")))
    assert(!c1.exists(_.contains("\"metaData\"")))
    // rewrite: removes BOTH parent files, adds its own
    val c2 = commitLines(root, 2L)
    assert(c2.count(_.contains("\"remove\"")) == 2, c2.mkString("|"))
    assert(c2.count(_.contains("\"add\"")) == 1)
  }

  test("sync is idempotent and incremental; schema change re-emits metaData") {
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    DeltaLog.sync(spark, root)
    val before = commitLines(root, 0L)
    // widen the schema in a second commit; sync again (covers both the
    // no-op re-sync of commit 0 and the incremental commit 1)
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a", 7L)).toDF("k", "v", "extra")
        .coalesce(1).write.parquet(tmp))
    DeltaLog.sync(spark, root)
    assert(commitLines(root, 0L) == before, "existing commits are immutable")
    val c1 = commitLines(root, 1L)
    assert(c1.exists(_.contains("\"metaData\"")), "schema change must re-emit metaData")
    assert(c1.exists(_.contains("extra")), c1.mkString("|"))
    // reader honors each version's declared schema
    assert(DeltaLog.readAt(spark, root, 0L).columns.toSeq == Seq("k", "v"))
    assert(DeltaLog.readAt(spark, root, 1L).columns.toSeq == Seq("k", "v", "extra"))
  }

  // ----- externally-written logs -----

  /** Writes `df` as ONE parquet file named `name` directly under `root`
    * (the flat layout external writers produce).
    */
  private def writeFlat(root: String, name: String,
                        df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = Files.createTempDirectory("graft-delta-flat").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(root))
    Files.move(part, Paths.get(root, name), StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeCommit(root: String, v: Long, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(root, "_delta_log"))
    Files.write(Paths.get(root, "_delta_log", f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  private val extSchema =
    """{"type":"struct","fields":[
      {"name":"k","type":"long","nullable":true,"metadata":{}},
      {"name":"v","type":"string","nullable":true,"metadata":{}}]}"""
      .replaceAll("\n\\s*", "")

  test("reads an externally-written checkpointless multi-commit log") {
    val root = freshRoot()
    writeFlat(root, "part-a.parquet", Seq((1L, "a")).toDF("k", "v"))
    writeFlat(root, "part b.parquet", Seq((2L, "b")).toDF("k", "v"))
    writeFlat(root, "part-c.parquet", Seq((3L, "c")).toDF("k", "v"))
    // commit 0: unusual field order, commitInfo noise, URL-encoded path
    writeCommit(root, 0L, Seq(
      """{"commitInfo":{"operation":"WRITE","engineInfo":"someone-else"}}""",
      s"""{"metaData":{"partitionColumns":[],"schemaString":"${extSchema.replace("\"", "\\\"")}","format":{"provider":"parquet","options":{}},"id":"ext-1234","configuration":{}}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"add":{"path":"part-a.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""",
      """{"add":{"path":"part%20b.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    // commit 1: retire a, add c; txn noise ignored
    writeCommit(root, 1L, Seq(
      """{"txn":{"appId":"x","version":9}}""",
      """{"remove":{"path":"part-a.parquet","deletionTimestamp":2,"dataChange":true}}""",
      """{"add":{"path":"part-c.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""))
    assert(DeltaLog.currentVersion(root) == 1L)
    assert(rows(DeltaLog.readAt(spark, root, 0L)) == Set((1L, "a"), (2L, "b")))
    assert(rows(DeltaLog.read(spark, root)) == Set((2L, "b"), (3L, "c")))
    assert(DeltaLog.filesAt(root, 1L) == Seq("part b.parquet", "part-c.parquet"))
  }

  test("empty active set returns the declared schema with zero rows") {
    val root = freshRoot()
    writeFlat(root, "part-a.parquet", Seq((1L, "a")).toDF("k", "v"))
    writeCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"ext-1","format":{"provider":"parquet","options":{}},"schemaString":"${extSchema.replace("\"", "\\\"")}","partitionColumns":[],"configuration":{}}}""",
      """{"add":{"path":"part-a.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    writeCommit(root, 1L, Seq(
      """{"remove":{"path":"part-a.parquet","deletionTimestamp":2,"dataChange":true}}"""))
    val df = DeltaLog.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.count() == 0L)
  }

  test("refuses what it cannot honor: features, partitions, gaps, absolutes") {
    val root = freshRoot()
    writeCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}"""))
    val e1 = intercept[IllegalArgumentException](DeltaLog.read(spark, root))
    assert(e1.getMessage.contains("minReaderVersion"))

    val root2 = freshRoot()
    writeCommit(root2, 0L, Seq(
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"${extSchema.replace("\"", "\\\"")}","partitionColumns":["k"],"configuration":{}}}"""))
    val e2 = intercept[IllegalArgumentException](DeltaLog.read(spark, root2))
    assert(e2.getMessage.contains("partitioned"))

    val root3 = freshRoot()
    writeCommit(root3, 0L, Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""))
    writeCommit(root3, 2L, Seq("""{"add":{"path":"p.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val e3 = intercept[IllegalArgumentException](DeltaLog.readAt(spark, root3, 2L))
    assert(e3.getMessage.contains("missing"))

    val root4 = freshRoot()
    writeCommit(root4, 0L, Seq(
      """{"add":{"path":"/abs/p.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val e4 = intercept[IllegalArgumentException](DeltaLog.read(spark, root4))
    assert(e4.getMessage.contains("unsupported"))
  }
}
