package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Snapshot log contracts: pinned readers survive concurrent commits,
  * time travel replays history, appends share parent files, compaction
  * composes with versioning, vacuum reclaims, crashes heal.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-snap").toString + "/tbl"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("pinned reader keeps its snapshot while a merge commits underneath") {
    val root = freshRoot()
    Snapshots.mergeIntoSnapshot(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ts"),
      Seq("k"), Seq("ts", "k"))
    val pinned = Snapshots.read(spark, root) // file list resolved NOW
    // a second merge rewrites the table as v2; v1's dir is untouched
    Snapshots.mergeIntoSnapshot(spark, root,
      Seq((2L, "B", 2L), (3L, "c", 2L)).toDF("k", "v", "ts"),
      Seq("k"), Seq("ts", "k"))
    assert(rows(pinned) == Set((1L, "a"), (2L, "b")),
      "reader pinned before the merge must still see the pre-merge rows")
    assert(rows(Snapshots.read(spark, root)) ==
      Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("time travel: readAt replays every committed state; history lists versions") {
    val root = freshRoot()
    val v1 = Snapshots.mergeIntoSnapshot(spark, root,
      Seq((1L, "a", 1L)).toDF("k", "v", "ts"), Seq("k"), Seq("ts", "k"))
    val v2 = Snapshots.mergeIntoSnapshot(spark, root,
      Seq((1L, "A", 2L), (2L, "b", 2L)).toDF("k", "v", "ts"),
      Seq("k"), Seq("ts", "k"))
    assert((v1, v2) == (1L, 2L))
    assert(Snapshots.versions(root) == Seq(1L, 2L))
    assert(rows(Snapshots.readAt(spark, root, 1L)) == Set((1L, "a")))
    assert(rows(Snapshots.readAt(spark, root, 2L)) == Set((1L, "A"), (2L, "b")))
    intercept[IllegalArgumentException](Snapshots.readAt(spark, root, 3L))
  }

  test("append commit shares the parent's physical files instead of copying") {
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    Snapshots.commitAppend(root)(tmp =>
      Seq((2L, "b")).toDF("k", "v").coalesce(1).write.parquet(tmp))
    assert(rows(Snapshots.read(spark, root)) == Set((1L, "a"), (2L, "b")))
    // v2's manifest must reference v1's data dir — shared, not copied
    val m2 = Files.readAllLines(
      Paths.get(root, "_log", f"v${2L}%020d.manifest"))
    assert(m2.asScala.exists(_.startsWith(f"d${1L}%020d/")), m2.toString)
    assert(m2.asScala.exists(_.startsWith(f"d${2L}%020d/")), m2.toString)
    // and v1 alone still reads the original single row
    assert(rows(Snapshots.readAt(spark, root, 1L)) == Set((1L, "a")))
  }

  test("compaction is a new version with identical rows; pre-compaction stays readable") {
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      spark.range(0L, 1000L).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v"))
        .repartition(8).write.parquet(tmp))
    val before = rows(Snapshots.read(spark, root))
    val v2 = Snapshots.compactSnapshot(spark, root, targetRowsPerFile = 1000L)
    assert(v2 == 2L)
    assert(rows(Snapshots.read(spark, root)) == before)
    assert(rows(Snapshots.readAt(spark, root, 1L)) == before)
    // compacted layout really has fewer files
    def nFiles(v: Long) = Files.readAllLines(
      Paths.get(root, "_log", f"v$v%020d.manifest")).size - 2
    assert(nFiles(2L) < nFiles(1L))
  }

  test("optimizeSnapshot: Z-clustered rewrite keeps rows, history, and skips files") {
    val root = freshRoot()
    import org.apache.spark.sql.functions.{col, pmod}
    Snapshots.commitRewrite(root)(tmp =>
      spark.range(0L, 4096L)
        .select(col("id").as("k"), col("id").as("v"),
          pmod(col("id") * 37L, org.apache.spark.sql.functions.lit(64L)).as("x"),
          pmod(col("id") * 101L, org.apache.spark.sql.functions.lit(64L)).as("y"))
        .repartition(8).write.parquet(tmp))
    val before = Snapshots.read(spark, root).collect().map(_.toString).sorted.toSeq
    val v2 = Snapshots.optimizeSnapshot(spark, root, "x", "y", bits = 6, numFiles = 8)
    assert(v2 == 2L)
    assert(Snapshots.read(spark, root).collect().map(_.toString).sorted.toSeq
      == before, "optimize must not change rows")
    assert(Snapshots.readAt(spark, root, 1L).collect().length == 4096,
      "pre-optimize version must stay readable")
    // the clustered layout actually skips: a selective x-range opens
    // fewer files than the table has
    val dataDir = java.nio.file.Paths.get(root, f"d${2L}%020d").toString
    val opened = Layout.fileManifest(spark, dataDir, Seq("x"))
      .filter(col("min_x") <= 8L && col("max_x") >= 0L).count()
    assert(opened < 8, s"no skipping benefit: $opened of 8 files overlap x<=8")
  }

  test("idempotent re-delivery: merging the same batch twice is a no-op state") {
    val root = freshRoot()
    val batch = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ts")
    Snapshots.mergeIntoSnapshot(spark, root, batch, Seq("k"), Seq("ts", "k"))
    Snapshots.mergeIntoSnapshot(spark, root, batch, Seq("k"), Seq("ts", "k"))
    assert(rows(Snapshots.read(spark, root)) == Set((1L, "a"), (2L, "b")))
    assert(Snapshots.currentVersion(root) == 2L) // two commits, same state
  }

  test("diff: insert/delete/update classification with null-safe column compare") {
    val root = freshRoot()
    // v1: keys 1..4; v2: 1 unchanged, 2 value-changed, 3 null→value
    // (must classify update, not unchanged), 4 deleted, 5 inserted
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("d")))
        .toDF("k", "v").write.parquet(tmp))
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, Some("a")), (2L, Some("B")), (3L, Some("c")), (5L, Some("e")))
        .toDF("k", "v").write.parquet(tmp))
    val got = Snapshots.diff(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(got == Set(
      ("update", 2L, Some("b"), Some("B")),
      ("update", 3L, None, Some("c")),
      ("delete", 4L, Some("d"), None),
      ("insert", 5L, None, Some("e"))), s"got $got")
    // mismatched column sets refuse loudly
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a", 9L)).toDF("k", "v", "extra").write.parquet(tmp))
    intercept[IllegalArgumentException](
      Snapshots.diff(spark, root, 2L, 3L, Seq("k")))
  }

  test("deleteWhere/updateWhere: SQL semantics, versioned, visible in the CDF") {
    import org.apache.spark.sql.functions.{col, lit, concat}
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").write.parquet(tmp))
    // DELETE WHERE k = 2: row gone now, still in v1, classified delete
    val v2 = Snapshots.deleteWhere(spark, root, col("k") === 2L)
    assert(rows(Snapshots.read(spark, root)) == Set((1L, "a"), (3L, "c")))
    assert(rows(Snapshots.readAt(spark, root, 1L)).size == 3)
    val d = Snapshots.diff(spark, root, 1L, v2, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(d == Set(("delete", 2L)), s"got $d")
    // UPDATE SET v = concat(v, v) WHERE k = 1: the SET sees the ORIGINAL row
    val v3 = Snapshots.updateWhere(spark, root, col("k") === 1L,
      Map("v" -> concat(col("v"), col("v"))))
    assert(rows(Snapshots.read(spark, root)) == Set((1L, "aa"), (3L, "c")))
    val u = Snapshots.diff(spark, root, v2, v3, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getString(3))).toSet
    assert(u == Set(("update", 1L, "a", "aa")), s"got $u")
    // a predicate referencing a SET column still sees original values:
    // UPDATE SET v='hit' WHERE v='aa' must not cascade into rows whose
    // v BECOMES 'aa'... (none here) and must not re-read its own write
    Snapshots.updateWhere(spark, root, col("v") === "aa",
      Map("v" -> lit("hit")))
    assert(rows(Snapshots.read(spark, root)) == Set((1L, "hit"), (3L, "c")))
    // a SWAP update (SET a=b, b=a) proves every SET reads the ORIGINAL
    // row — a sequential-withColumn refactor would yield (b, b)
    val rootSwap = freshRoot()
    Snapshots.commitRewrite(rootSwap)(tmp =>
      Seq((1L, "left", "right")).toDF("k", "a", "b").write.parquet(tmp))
    Snapshots.updateWhere(spark, rootSwap, lit(true),
      Map("a" -> col("b"), "b" -> col("a")))
    val swapped = Snapshots.read(spark, rootSwap)
      .select(col("a"), col("b")).head
    assert((swapped.getString(0), swapped.getString(1)) == ("right", "left"),
      "multi-SET must stage originals: a swap came out wrong")
    // a real column colliding with a staging name refuses loudly
    val rootClash = freshRoot()
    Snapshots.commitRewrite(rootClash)(tmp =>
      Seq((1L, "x", "y")).toDF("k", "v", "__p").write.parquet(tmp))
    intercept[IllegalArgumentException](
      Snapshots.updateWhere(spark, rootClash, lit(true), Map("v" -> lit("z"))))
    // null-predicate rows (three-valued logic) are NOT deleted/updated
    val root2 = freshRoot()
    Snapshots.commitRewrite(root2)(tmp =>
      Seq((Some(1L), "a"), (None, "n"))
        .toDF("k", "v").write.parquet(tmp))
    Snapshots.deleteWhere(spark, root2, col("k") > 0L) // null > 0 → null → keep
    val left = Snapshots.read(spark, root2).collect()
      .map(r => Option(r.get(0)).map(_.toString).getOrElse("null")).toSet
    assert(left == Set("null"), s"got $left")
  }

  test("diff: a null-keyed row classifies by PRESENCE, not key null-ness") {
    val root = freshRoot()
    def df(rows: Seq[(Option[Long], String)]) = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (k, v) => Row(k.map(Long.box).orNull, v) }),
        StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
    }
    // v1 has a null-keyed row; v2 does not → that row is a DELETE (the
    // presence-marker contract; key-null inference would invert it to
    // an insert). The null keys in both versions pair null-safely.
    Snapshots.commitRewrite(root)(tmp =>
      df(Seq(Some(1L) -> "a", None -> "x")).write.parquet(tmp))
    Snapshots.commitRewrite(root)(tmp =>
      df(Seq(Some(1L) -> "a", Some(2L) -> "b")).write.parquet(tmp))
    val got = Snapshots.diff(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => (r.getString(0),
        Option(r.get(1)).map(_.toString).getOrElse("null"),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(got == Set(
      ("delete", "null", Some("x"), None),
      ("insert", "2", None, Some("b"))), s"got $got")
    // and a null-keyed row present in BOTH versions with a changed value
    // is an update, not an insert/delete pair
    Snapshots.commitRewrite(root)(tmp =>
      df(Seq(Some(1L) -> "a", None -> "y")).write.parquet(tmp))
    val got2 = Snapshots.diff(spark, root, 1L, 3L, Seq("k"))
      .collect().map(r => (r.getString(0),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(got2 == Set(("update", Some("x"), Some("y"))), s"got $got2")
  }

  test("vacuum drops old versions and their unshared dirs; the horizon is gone") {
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a")).toDF("k", "v").write.parquet(tmp))
    Snapshots.commitAppend(root)(tmp =>
      Seq((2L, "b")).toDF("k", "v").write.parquet(tmp))
    Snapshots.commitRewrite(root)(tmp =>
      Seq((9L, "z")).toDF("k", "v").write.parquet(tmp))
    Snapshots.vacuum(root, keepLast = 1)
    assert(Snapshots.versions(root) == Seq(3L))
    assert(rows(Snapshots.read(spark, root)) == Set((9L, "z")))
    intercept[IllegalArgumentException](Snapshots.readAt(spark, root, 2L))
    // v1/v2 dirs are unreferenced by v3 (a rewrite) → physically gone
    assert(!Files.exists(Paths.get(root, f"d${1L}%020d")))
    assert(!Files.exists(Paths.get(root, f"d${2L}%020d")))
  }

  test("vacuum keeps a shared ancestor dir alive while an append references it") {
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a")).toDF("k", "v").write.parquet(tmp))
    Snapshots.commitAppend(root)(tmp =>
      Seq((2L, "b")).toDF("k", "v").write.parquet(tmp))
    Snapshots.vacuum(root, keepLast = 1) // keeps v2, which references d1
    assert(Snapshots.versions(root) == Seq(2L))
    assert(Files.exists(Paths.get(root, f"d${1L}%020d")),
      "shared ancestor dir must survive vacuum")
    assert(rows(Snapshots.read(spark, root)) == Set((1L, "a"), (2L, "b")))
  }

  test("crash healing: an unreferenced data dir is invisible and recover deletes it") {
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a")).toDF("k", "v").write.parquet(tmp))
    // simulate a crash AFTER the data-dir rename, BEFORE the manifest:
    // a complete orphan dir one version ahead
    val orphan = Paths.get(root, f"d${2L}%020d")
    Seq((9L, "junk")).toDF("k", "v").write.parquet(orphan.toString)
    assert(Snapshots.currentVersion(root) == 1L) // log rules: orphan invisible
    assert(rows(Snapshots.read(spark, root)) == Set((1L, "a")))
    Snapshots.recover(root)
    assert(!Files.exists(orphan))
    // and the next commit lands cleanly as v2
    Snapshots.commitRewrite(root)(tmp =>
      Seq((2L, "b")).toDF("k", "v").write.parquet(tmp))
    assert(rows(Snapshots.read(spark, root)) == Set((2L, "b")))
  }

  test("crash healing: a vacuum crash between manifest and dir delete is reclaimed") {
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a")).toDF("k", "v").write.parquet(tmp))
    Snapshots.commitRewrite(root)(tmp =>
      Seq((2L, "b")).toDF("k", "v").write.parquet(tmp))
    // simulate vacuum(keepLast=1) crashing AFTER the manifest delete,
    // BEFORE the data-dir delete: v1's manifest gone, d1 stranded
    Files.delete(Paths.get(root, "_log", f"v${1L}%020d.manifest"))
    assert(Files.exists(Paths.get(root, f"d${1L}%020d")))
    Snapshots.recover(root)
    assert(!Files.exists(Paths.get(root, f"d${1L}%020d")),
      "recover must reclaim a data dir no surviving manifest references")
    assert(rows(Snapshots.read(spark, root)) == Set((2L, "b")))
  }

  test("crash healing: a staging .__tmp leftover never blocks the next commit") {
    val root = freshRoot()
    Snapshots.commitRewrite(root)(tmp =>
      Seq((1L, "a", 1L)).toDF("k", "v", "ts").write.parquet(tmp))
    val staging = Paths.get(root, f"d${2L}%020d.__tmp")
    Files.createDirectories(staging)
    Files.write(staging.resolve("partial"), "x".getBytes)
    Snapshots.mergeIntoSnapshot(spark, root,
      Seq((2L, "b", 1L)).toDF("k", "v", "ts"), Seq("k"), Seq("ts", "k"))
    assert(rows(Snapshots.read(spark, root)) == Set((1L, "a"), (2L, "b")))
    assert(!Files.exists(staging))
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.toSeq
    }
  }
  test("countFast: footer-sum count equals the real count, zero data read") {
    val root = freshRoot()
    Snapshots.commitAppend(root)(tmp =>
      spark.range(0, 1234).selectExpr("id AS k", "CAST(id AS STRING) AS v",
        "id AS ts").write.mode("overwrite").parquet(tmp))
    Snapshots.commitAppend(root)(tmp =>
      spark.range(5000, 5432).selectExpr("id AS k", "CAST(id AS STRING) AS v",
        "id AS ts").write.mode("overwrite").parquet(tmp))
    val r = Snapshots.countFast(spark, root).head()
    assert(r.getLong(0) == 1234L + 432L)
    assert(r.getLong(1) >= 2L) // at least one file per commit
    assert(r.getLong(0) == Snapshots.read(spark, root).count())
  }

}
