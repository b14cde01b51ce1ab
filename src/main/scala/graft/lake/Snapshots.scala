package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot-versioned table storage — the transaction-log half of the
  * Delta emulation ([[Upsert]] provides MERGE semantics; this provides
  * snapshot isolation, time travel, and VACUUM; reference:
  * analytics/spark/conf/spark-defaults.conf:5-10 stores every table in
  * Delta, README.md:295 recommends OPTIMIZE/VACUUM maintenance).
  *
  * Layout (all under the table root):
  * {{{
  *   _log/v00000000000000000001.manifest   one per committed version
  *   d00000000000000000001/                immutable data dir per commit
  * }}}
  * A manifest is a text file: a format tag line, a `kind` line
  * (`rewrite` | `append`), then one table-relative parquet path per
  * line. THE LOG IS THE SOURCE OF TRUTH: the current version is the
  * highest manifest present, and the manifest's atomic rename into
  * `_log/` is the commit point — there is no mutable pointer file to
  * get out of sync. A data dir with no manifest is an invisible orphan
  * (a crashed commit) that [[recover]] deletes.
  *
  * Isolation: data dirs are never renamed or rewritten after commit, so
  * a reader that resolved its file list (every [[read]]/[[readAt]] call
  * does, eagerly) keeps a consistent snapshot while any number of later
  * commits land — the property the in-place [[Upsert.atomicSwapWrite]]
  * cannot give a concurrent reader mid-swap. Old snapshots stay
  * readable until [[vacuum]] reclaims them.
  *
  * Commit granularity: a `rewrite` commit references only its own dir
  * (MERGE, compaction); an `append` commit references the parent
  * version's files PLUS its own dir, so appending N rows costs N rows
  * of I/O and a manifest — never a table rewrite (the Bronze ingest
  * cadence). Appended files must be schema-compatible with the parent
  * (the Delta append contract; a widening change goes through a
  * rewrite).
  *
  * Writer concurrency: single writer per table, the reference's
  * orchestration posture (one Airflow DAG owns each table). Multi-writer
  * needs a CAS/lock on the version allocation — out of scope here, as
  * is multi-table transactionality. At cluster scale the same design
  * runs against an object store with a rename-capable committer; every
  * driver-side structure (manifest, file list) is one row per FILE,
  * bounded by layout granularity, not data size.
  */
object Snapshots {

  private val FormatTag = "graft-snapshot-v1"

  private def logDir(root: String): Path = Paths.get(root, "_log")
  private def dataDirName(v: Long): String = f"d$v%020d"
  private def manifestName(v: Long): String = f"v$v%020d.manifest"
  /** Commit wall time of a version ≈ its manifest's mtime (for interop
    * metadata like Delta's deletionTimestamp; never correctness-bearing).
    */
  private[lake] def commitTimeMillis(root: String, version: Long): Long =
    Files.getLastModifiedTime(logDir(root).resolve(manifestName(version)))
      .toMillis
  private def versionOf(manifest: String): Long =
    manifest.stripPrefix("v").stripSuffix(".manifest").toLong

  /** Highest committed version, 0 if the table does not exist yet. */
  def currentVersion(root: String): Long = {
    val log = logDir(root)
    if (!Files.isDirectory(log)) 0L
    else {
      val s = Files.list(log)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(versionOf).foldLeft(0L)(math.max)
      finally s.close()
    }
  }

  /** All committed versions, ascending — the `DESCRIBE HISTORY` analog. */
  def versions(root: String): Seq[Long] = {
    val log = logDir(root)
    if (!Files.isDirectory(log)) Seq.empty
    else {
      val s = Files.list(log)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(versionOf).toSeq.sorted
      finally s.close()
    }
  }

  /** Table-relative parquet paths a version resolves to. */
  private[lake] def manifestFiles(root: String, version: Long): Seq[String] = {
    val m = logDir(root).resolve(manifestName(version))
    require(Files.exists(m),
      s"Snapshots: version $version of $root does not exist (vacuumed or never committed)")
    val lines = Files.readAllLines(m).asScala.toSeq
    require(lines.headOption.contains(FormatTag),
      s"Snapshots: $m is not a $FormatTag manifest")
    lines.drop(2).filter(_.nonEmpty)
  }

  /** Read the table AT `version` — time travel. The file list resolves
    * HERE, eagerly, so the returned frame is a pinned snapshot: later
    * commits (which only ever add new dirs) cannot change what it reads,
    * and only [[vacuum]] can invalidate it.
    */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val files = manifestFiles(root, version).map(f => Paths.get(root, f).toString)
    if (files.isEmpty) throw new IllegalArgumentException(
      s"Snapshots: version $version of $root has an empty manifest")
    spark.read.parquet(files: _*)
  }

  /** Read the current snapshot (the highest committed version). */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, currentVersion(root))

  /** Metadata-only COUNT(*) — the query a lakehouse answers without
    * touching a data page: parquet FOOTERS carry exact per-row-group
    * row counts, so the snapshot's total is the sum over its files'
    * footer blocks. File listing and footer reads are DISTRIBUTED
    * (one task per manifest-dir batch, Hadoop FileSystem API so the
    * same code walks HDFS/S3); bytes read ∝ footer size, not table
    * size — at 100 TB this is the difference between milliseconds of
    * metadata and a full scan. q225 gates the sum against the real
    * COUNT(*).
    *
    * Output is ONE row: (n_rows, n_files).
    */
  def countFast(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val dirs = manifestFiles(root, currentVersion(root))
      .map(f => Paths.get(root, f).toString)
    // Ship the SESSION'S hadoopConfiguration to the tasks (resolved
    // key/value pairs, rebuilt into a Configuration per task) — a bare
    // `new Configuration()` inside the task loses S3 credentials / FS
    // settings, so "the same code walks HDFS/S3" would only have been
    // true for local paths. Listing is recursive (fs.listFiles(_, true))
    // so partitioned/nested data dirs are counted, not silently missed.
    val hadoopProps: Array[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val confBc = spark.sparkContext.broadcast(hadoopProps)
    def taskConf(): org.apache.hadoop.conf.Configuration = {
      val c = new org.apache.hadoop.conf.Configuration(false)
      confBc.value.foreach { case (k, v) => c.set(k, v) }
      c
    }
    spark.createDataset(dirs)
      .repartition(math.max(1, math.min(dirs.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { dir =>
        val path = new org.apache.hadoop.fs.Path(dir)
        val fs = path.getFileSystem(taskConf())
        val it = fs.listFiles(path, true)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet"))
            out += st.getPath.toString
        }
        out.toSeq
      }
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), taskConf())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally r.close()
      }
      .toDF("__n")
      .agg(coalesce(org.apache.spark.sql.functions.sum(col("__n")), lit(0L))
        .as("n_rows"), count(lit(1)).as("n_files"))
  }

  /** Commit a full-table REWRITE as the next version: `write` receives a
    * fresh staging dir; on return the dir is renamed into place and the
    * manifest rename commits it. Returns the new version. A crash at any
    * step leaves either a `.__tmp` staging leftover or an unreferenced
    * data dir — both invisible to readers and healed by [[recover]].
    */
  def commitRewrite(root: String)(write: String => Unit): Long =
    commit(root, parentFiles = Seq.empty, kind = "rewrite")(write)

  /** Commit an APPEND as the next version: the new manifest references
    * the parent version's files plus whatever `write` produced — no
    * existing data is copied or rewritten. Appended files must be
    * schema-compatible with the parent snapshot.
    */
  def commitAppend(root: String)(write: String => Unit): Long = {
    val parent = currentVersion(root)
    val files = if (parent == 0L) Seq.empty else manifestFiles(root, parent)
    commit(root, parentFiles = files, kind = "append")(write)
  }

  private def commit(root: String, parentFiles: Seq[String], kind: String)
                    (write: String => Unit): Long = {
    Files.createDirectories(logDir(root))
    val v = currentVersion(root) + 1L
    val dataName = dataDirName(v)
    val staging = Paths.get(root, dataName + ".__tmp")
    val dataDir = Paths.get(root, dataName)
    deleteRecursively(staging) // stale leftover from a crashed attempt
    deleteRecursively(dataDir) // unreferenced orphan (crash after dir rename)
    write(staging.toString)
    Files.move(staging, dataDir, StandardCopyOption.ATOMIC_MOVE)
    val own = {
      val s = Files.list(dataDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted.map(f => s"$dataName/$f")
      finally s.close()
    }
    require(own.nonEmpty || parentFiles.nonEmpty,
      s"Snapshots: commit produced no parquet files at $dataDir")
    val body = (Seq(FormatTag, s"kind=$kind") ++ parentFiles ++ own)
      .mkString("", "\n", "\n")
    val mTmp = logDir(root).resolve(manifestName(v) + ".__tmp")
    Files.write(mTmp, body.getBytes("UTF-8"))
    // THE commit point: an atomic rename into the log makes v current.
    Files.move(mTmp, logDir(root).resolve(manifestName(v)),
      StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** MERGE into a versioned table — [[Upsert.mergeIntoPath]]'s semantics
    * (latest-wins dedup, union-schema evolution, idempotent re-delivery)
    * committed as a rewrite snapshot instead of an in-place swap, so
    * concurrent readers keep their pinned version and the pre-merge
    * state stays time-travelable. Returns the committed version.
    */
  def mergeIntoSnapshot(spark: SparkSession, root: String, source: DataFrame,
                        keys: Seq[String], ordering: Seq[String],
                        orderingFirst: Boolean = false): Long = {
    recover(root)
    val cur = currentVersion(root)
    val merged =
      if (cur == 0L) Upsert.latestWins(source, keys, ordering)
      else if (orderingFirst)
        Upsert.mergeLatest(readAt(spark, root, cur), source, keys, ordering)
      else Upsert.merge(readAt(spark, root, cur), source, keys, ordering)
    commitRewrite(root)(tmp =>
      merged.write.mode(SaveMode.Overwrite).parquet(tmp))
  }

  /** Small-file compaction as a snapshot commit — [[Layout.compact]]'s
    * maintenance pass, composed with versioning: the compacted layout is
    * a NEW version with identical rows, and every pre-compaction version
    * remains readable until vacuumed (the OPTIMIZE-then-time-travel
    * behavior the reference's Delta stack has).
    */
  def compactSnapshot(spark: SparkSession, root: String,
                      targetRowsPerFile: Long): Long = {
    require(targetRowsPerFile >= 1,
      s"compactSnapshot: targetRowsPerFile >= 1, got $targetRowsPerFile")
    recover(root)
    val df = read(spark, root)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    commitRewrite(root)(tmp =>
      df.repartition(files).write.mode(SaveMode.Overwrite).parquet(tmp))
  }

  /** Delta `DELETE FROM t WHERE …` as a snapshot commit: the current
    * snapshot minus the matching rows becomes the next version; the
    * removed rows stay time-travelable (and visible as `delete` rows in
    * [[diff]]) until vacuumed. Returns the committed version.
    * Rewrite granularity, like every commit here — at Delta's
    * file-level granularity only touched files rewrite; the semantics
    * are identical.
    */
  def deleteWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column): Long = {
    recover(root)
    val kept = read(spark, root).filter(!coalesce(predicate, lit(false)))
    commitRewrite(root)(tmp =>
      kept.write.mode(SaveMode.Overwrite).parquet(tmp))
  }

  /** Delta `UPDATE t SET col = expr WHERE …` as a snapshot commit:
    * matching rows get each `set` column replaced, all other rows and
    * columns carry unchanged; [[diff]] shows exactly the updated keys.
    * Returns the committed version.
    */
  def updateWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column,
                  set: Map[String, org.apache.spark.sql.Column]): Long = {
    require(set.nonEmpty, "updateWhere: at least one column to set")
    recover(root)
    val cur = read(spark, root)
    set.keys.foreach(c => require(cur.columns.contains(c),
      s"updateWhere: column '$c' not in table (${cur.columns.mkString(",")})"))
    // The staging columns below would silently REPLACE (and then drop) a
    // real table column with one of these names — refuse loudly instead.
    val reserved = "__p" +: set.keys.map(c => s"__set_$c").toSeq
    val clash = cur.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"updateWhere: table columns ${clash.mkString(",")} collide with " +
        "internal staging names (__p / __set_<col>) — rename them first")
    // SQL UPDATE semantics: the predicate AND every SET expression
    // evaluate against the ORIGINAL row — stage them all before any
    // column is replaced, so one SET can't observe another's result.
    val staged = set.toSeq.foldLeft(
        cur.withColumn("__p", coalesce(predicate, lit(false)))) {
      case (df, (c, e)) => df.withColumn(s"__set_$c", e)
    }
    val updated = set.keys.foldLeft(staged) { (df, c) =>
      df.withColumn(c, when(col("__p"), col(s"__set_$c")).otherwise(col(c)))
    }.drop("__p" +: set.keys.map(c => s"__set_$c").toSeq: _*)
    commitRewrite(root)(tmp =>
      updated.write.mode(SaveMode.Overwrite).parquet(tmp))
  }

  /** OPTIMIZE ZORDER as a snapshot commit — the Delta
    * `OPTIMIZE … ZORDER BY (x, y)` maintenance pass (reference
    * README.md:295) composed with versioning: the current snapshot is
    * rewritten Z-clustered ([[Layout.zorderWrite]] — Morton-keyed range
    * partitioning, so selective 2-D reads open a small fraction of
    * files via [[Layout.skippingRead]]) as a NEW version with identical
    * rows; every pre-optimize version stays time-travelable until
    * vacuumed. Returns the committed version.
    */
  def optimizeSnapshot(spark: SparkSession, root: String, xCol: String,
                       yCol: String, bits: Int, numFiles: Int): Long = {
    recover(root)
    val df = read(spark, root)
    commitRewrite(root)(tmp =>
      Layout.zorderWrite(df, tmp, xCol, yCol, bits, numFiles))
  }

  /** Change-data-feed between two committed versions — the Delta CDF
    * analog, derivable from any pair of snapshots after the fact (no
    * write-path capture needed at rewrite granularity): one row per key
    * whose state changed from `fromVersion` to `toVersion`, classified
    * `insert` (key only in `to`), `delete` (only in `from`) or `update`
    * (in both, any non-key column differing null-safely), with the full
    * before/after column images (`old_*` / `new_*`). Unchanged keys are
    * absent. Both snapshots must be key-unique on `keys` (the MERGE
    * table contract) and share a column set.
    *
    * Scale posture: ONE full-outer shuffle join on the key — the
    * minimum any snapshot comparison can do — with every classification
    * predicate row-local (IS DISTINCT FROM, codegen'd).
    */
  def diff(spark: SparkSession, root: String, fromVersion: Long,
           toVersion: Long, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "Snapshots.diff: at least one key column")
    val a = readAt(spark, root, fromVersion)
    val b = readAt(spark, root, toVersion)
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"Snapshots.diff: column sets differ (${a.columns.mkString(",")} vs " +
        s"${b.columns.mkString(",")}) — diff a schema change via readAt directly")
    val vals = a.columns.filterNot(keys.contains).toSeq
    // Side presence comes from an explicit marker, NOT from key
    // null-ness: a null-keyed row present only in `from` would otherwise
    // read as "insert" (all join-side columns are null after a full
    // outer miss, keys included). The join itself is null-SAFE so
    // null-keyed rows pair up instead of cross-emitting.
    val aa = a.select(a.columns.map(c => col(c).as(s"__a_$c")).toIndexedSeq
      :+ lit(true).as("__a_present"): _*)
    val bb = b.select(b.columns.map(c => col(c).as(s"__b_$c")).toIndexedSeq
      :+ lit(true).as("__b_present"): _*)
    val cond = keys.map(k => aa(s"__a_$k") <=> bb(s"__b_$k")).reduce(_ && _)
    val joined = aa.join(bb, cond, "full_outer")
    val inA = col("__a_present").isNotNull
    val inB = col("__b_present").isNotNull
    val changed = vals.map(c =>
      not(col(s"__a_$c") <=> col(s"__b_$c"))).reduceOption(_ || _)
      .getOrElse(lit(false))
    joined
      .withColumn("change_type",
        when(!inA, lit("insert"))
          .when(!inB, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(col("change_type") +:
        keys.map(k => coalesce(col(s"__b_$k"), col(s"__a_$k")).as(k)) ++:
        vals.flatMap(c => Seq(col(s"__a_$c").as(s"old_$c"),
          col(s"__b_$c").as(s"new_$c"))): _*)
  }

  /** Reclaim storage: keep the newest `keepLast` versions' manifests,
    * delete older manifests and every data dir no surviving manifest
    * references (append chains keep shared ancestors alive). Time
    * travel past the horizon is gone afterward — the VACUUM trade,
    * applied to manifests instead of Delta's retention window.
    */
  def vacuum(root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"vacuum: keepLast >= 1, got $keepLast")
    val all = versions(root)
    val dropped = all.dropRight(keepLast)
    val kept = all.takeRight(keepLast)
    val referenced = kept.flatMap(v => manifestFiles(root, v))
      .map(_.split('/').head).toSet
    dropped.foreach { v =>
      Files.deleteIfExists(logDir(root).resolve(manifestName(v)))
      val d = Paths.get(root, dataDirName(v))
      if (!referenced.contains(dataDirName(v))) deleteRecursively(d)
    }
  }

  /** Heal after a crashed commit OR a crashed [[vacuum]]: delete
    * `.__tmp` staging leftovers (data dirs and manifests) and every
    * data dir that NO surviving manifest references — that covers both
    * the crashed-commit orphan (dir renamed, manifest never landed) and
    * the crashed-vacuum leftover (manifest deleted, dir delete never
    * ran), which a version-ordered rule would strand forever.
    * Idempotent; single-writer contract — run it where
    * [[Upsert.recover]] would be run.
    */
  def recover(root: String): Unit = {
    val rootP = Paths.get(root)
    if (!Files.isDirectory(rootP)) return
    val referenced = versions(root)
      .flatMap(v => manifestFiles(root, v)).map(_.split('/').head).toSet
    val entries = {
      val s = Files.list(rootP)
      try s.iterator().asScala.toSeq finally s.close()
    }
    entries.foreach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".__tmp")) deleteRecursively(p)
      else if (n.startsWith("d") && n.length == 21 && n.drop(1).forall(_.isDigit)
          && !referenced.contains(n))
        deleteRecursively(p)
    }
    val log = logDir(root)
    if (Files.isDirectory(log)) {
      val s = Files.list(log)
      try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".__tmp"))
        .toSeq.foreach(deleteRecursively)
      finally s.close()
    }
  }

  private def deleteRecursively(p: Path): Unit = Upsert.deleteRecursively(p)
}
