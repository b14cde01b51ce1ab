package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{assert_true, col, count, expr, hash,
  input_file_name, lit, max, pmod, regexp_extract, row_number, sum, when}
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.jdk.CollectionConverters._

/** Delta Lake transaction-log interop for [[Snapshots]] tables — the
  * format bridge to the reference's storage layer (its tables are Delta:
  * analytics/spark/jobs/silver_orders.py:72-84,
  * analytics/spark/conf/spark-defaults.conf:5-10). Two halves, both
  * speaking the PUBLIC Delta protocol (delta.io PROTOCOL.md):
  *
  *  - '''Writer''' ([[sync]]): materializes `_delta_log/%020d.json`
  *    commits alongside the graft manifest log, one per committed
  *    snapshot version, so an EXTERNAL Delta reader (Spark+delta,
  *    duckdb delta_scan, delta-rs) can open the table directly. Graft
  *    version v maps to Delta commit v−1 (Delta logs are 0-based).
  *    Commit 0 carries `protocol` (reader 1 / writer 2 — no table
  *    features used) and `metaData` (id, parquet format, Spark-JSON
  *    `schemaString`); later commits re-emit `metaData` only when the
  *    snapshot schema actually changed (the Delta schema-evolution
  *    idiom). File deltas come from manifest set-difference: a rewrite
  *    commit emits `remove` for every parent file plus `add` for its
  *    own; an append emits only `add`s — so the Delta view of history
  *    is file-for-file the manifest view. Every `checkpointInterval`
  *    commits sync also writes a classic parquet CHECKPOINT
  *    (`%020d.checkpoint.parquet`, one row per action) plus the
  *    `_last_checkpoint` pointer, so external readers of a long log
  *    replay one parquet file + a JSON tail instead of every commit —
  *    exactly what Spark's own Delta writer does every 10 commits.
  *
  *  - '''Reader''' ([[read]]/[[readAt]]): replays an externally-written
  *    Delta log. Version resolution starts from the NEWEST complete
  *    checkpoint at or below the requested version (single-part
  *    `%020d.checkpoint.parquet` or multi-part
  *    `%020d.checkpoint.%010d.%010d.parquet`; discovery is by listing,
  *    so a stale or missing `_last_checkpoint` hint never breaks
  *    reads), then applies the JSON commits after it — line-delimited
  *    actions, `add` activating a file, `remove` retiring it (last
  *    action per path wins), `metaData` carrying the schema, unknown
  *    actions (`commitInfo`, `txn`, …) skipped. PARTITIONED tables are
  *    honored: `metaData.partitionColumns` names columns whose values
  *    live in each add's `partitionValues` (not in the data files); the
  *    reader scans each partition's files with the data schema and
  *    attaches the partition columns as typed literals, so a filter on
  *    a partition column constant-folds per partition and PRUNES whole
  *    scans at plan time. Scope: parquet format, relative paths,
  *    reader protocol 1; protocol 2 with column-mapping mode none or
  *    name (physical parquet names resolved from schema metadata);
  *    protocol 3 when every named readerFeature is supported
  *    (deletionVectors, timestampNtz, vacuumProtocolCheck,
  *    v2Checkpoint, columnMapping in modes none/name).
  *    Anything else fails loudly NAMING the missing feature rather
  *    than returning wrong rows.
  *
  *  - '''Partitioned writer''' ([[commitPartitioned]]): commits a
  *    DataFrame as a hive-laid-out partitioned Delta table (the common
  *    shape of any real lake) — `col=value` data paths, partition
  *    values recorded in each `add`'s `partitionValues`,
  *    `partitionColumns` declared in `metaData`.
  *
  * Scale posture: everything here is file-granularity metadata — one
  * JSON line (or checkpoint row) per file per commit, schema reads
  * touch parquet FOOTERS only — bounded by layout, never data size.
  * Sync is idempotent (commits and checkpoints already on disk are
  * never rewritten; the rename is the same atomic-move commit point the
  * manifest uses), so it can run after every [[Snapshots]] commit or
  * once at publish time.
  */
object DeltaLog {

  private val mapper = new ObjectMapper()

  /** Executor for overlapping INDEPENDENT Spark jobs inside one DML
    * commit (change-capture writes vs the data rewrite): Spark's
    * scheduler runs concurrent jobs FIFO, so the side job back-fills
    * executor slots freed by the main job's tail instead of paying its
    * whole fixed cost sequentially. Daemon threads; unbounded pool is
    * safe — at most one side job per in-flight DML call.
    */
  private[graft] lazy val sideJobEc: ExecutionContext =
    ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-delta-sidejob")
        t.setDaemon(true)
        t
      }))

  private def logDir(root: String): Path = Paths.get(root, "_delta_log")
  private def commitName(v: Long): String = f"$v%020d.json"
  private def checkpointName(v: Long): String = f"$v%020d.checkpoint.parquet"
  private def versionOf(name: String): Long =
    name.stripSuffix(".json").toLong

  private def listLog(root: String): Seq[String] = {
    val log = logDir(root)
    if (!Files.isDirectory(log)) Seq.empty
    else {
      val s = Files.list(log)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
  }

  /** Delta commit versions present in `_delta_log`, ascending. */
  def versions(root: String): Seq[Long] =
    listLog(root)
      .filter(n => n.length == 25 && n.endsWith(".json")
        && n.dropRight(5).forall(_.isDigit))
      .map(versionOf).sorted

  /** Versions with a COMPLETE checkpoint present (single-part, or every
    * part of a multi-part set), ascending, with their parquet files.
    */
  def checkpointVersions(root: String): Seq[(Long, Seq[Path])] = {
    val names = listLog(root)
    val SingleRe = """(\d{20})\.checkpoint\.parquet""".r
    val single = names.collect { case n @ SingleRe(v) =>
      v.toLong -> Seq(logDir(root).resolve(n))
    }
    // multi-part: <v:20>.checkpoint.<k:10>.<n:10>.parquet
    val MultiRe = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    val multi = names.collect { case n @ MultiRe(v, k, t) =>
      (v.toLong, k.toInt, t.toInt, logDir(root).resolve(n))
    }.groupBy(_._1).collect {
      case (v, parts) if {
        val total = parts.head._3
        parts.map(_._2).toSet == (1 to total).toSet &&
          parts.forall(_._3 == total)
      } => v -> parts.sortBy(_._2).map(_._4)
    }
    (single ++ multi).sortBy(_._1)
  }

  /** One discovered checkpoint: classic parquet parts, or a V2 top file
    * (`<v>.checkpoint.<uuid>.{json|parquet}`, PROTOCOL.md "V2
    * Checkpoints") whose `sidecar` actions reference add/remove files
    * under `_delta_log/_sidecars/`.
    */
  private sealed trait CpRef { def version: Long }
  private case class ClassicCp(version: Long, parts: Seq[Path]) extends CpRef
  private case class V2Cp(version: Long, top: Path) extends CpRef

  private def checkpointRefs(root: String): Seq[CpRef] = {
    val classic = checkpointVersions(root)
      .map { case (v, ps) => ClassicCp(v, ps) }
    val V2Re = """(\d{20})\.checkpoint\.([0-9a-zA-Z-]{36})\.(json|parquet)""".r
    val v2 = listLog(root).collect { case n @ V2Re(v, _, _) =>
      V2Cp(v.toLong, logDir(root).resolve(n))
    }
    // same-version tie: classic sorts LAST (preferred — fewer moving
    // parts); both reconstruct the same state
    (classic ++ v2).sortBy(r =>
      (r.version, r match { case _: V2Cp => 0; case _ => 1 }))
  }

  /** Highest Delta version present — JSON commits OR complete
    * checkpoints (a fully compacted log whose retention cleanup deleted
    * every JSON commit is still readable from its newest checkpoint);
    * −1 if no log exists.
    */
  def currentVersion(root: String): Long =
    (versions(root) ++ checkpointRefs(root).map(_.version))
      .maxOption.getOrElse(-1L)

  // ------------------------------------------------------------------
  // Writer: graft manifest log → _delta_log
  // ------------------------------------------------------------------

  /** Write every missing `_delta_log` commit for `root`'s committed
    * snapshot versions, then any due checkpoints (one per
    * `checkpointInterval` commits, i.e. at Delta versions v where
    * `v % interval == 0`, v > 0 — Spark's own cadence is interval 10).
    * Returns the highest Delta version present afterwards. Idempotent:
    * existing commit and checkpoint files are left untouched (they are
    * immutable once renamed in, like the manifests).
    */
  def sync(spark: SparkSession, root: String,
           checkpointInterval: Int = 10): Long = {
    require(checkpointInterval >= 1,
      s"DeltaLog.sync: checkpointInterval >= 1, got $checkpointInterval")
    val gvs = Snapshots.versions(root)
    require(gvs.nonEmpty, s"DeltaLog.sync: no committed snapshots at $root")
    // Delta commits beyond the manifest mapping (graft v ↔ Delta v−1)
    // mean DML/compaction landed directly on the Delta log — it is now
    // the source of truth and re-syncing would resurrect removed files
    // and skip new appends. Fail loudly instead of silently diverging.
    // Detection is by MARKER, not by number: a DML commit can occupy
    // exactly the version the next sync would write, so every existing
    // commit in the mapped range must carry sync's own commitInfo.
    require(currentVersion(root) <= gvs.max - 1,
      s"DeltaLog.sync: the Delta log at $root has commits beyond the " +
        "manifest mapping (direct DML/OPTIMIZE?) — the table is " +
        "Delta-owned now; write through DeltaLog, not Snapshots+sync")
    versions(root).foreach { dv =>
      val lines = Files.readAllLines(logDir(root).resolve(commitName(dv)))
        .asScala.filter(_.trim.nonEmpty)
      val synced = lines.exists { l =>
        val n = mapper.readTree(l)
        n.path("commitInfo").path("operation").asText("") == "graft-sync"
      }
      require(synced,
        s"DeltaLog.sync: Delta commit $dv of $root was not written by " +
          "sync (direct DML/OPTIMIZE?) — the table is Delta-owned now; " +
          "write through DeltaLog, not Snapshots+sync")
    }
    Files.createDirectories(logDir(root))
    // Deterministic table id: stable across re-syncs of the same root.
    val tableId = java.util.UUID.nameUUIDFromBytes(
      ("graft-delta:" + root).getBytes("UTF-8")).toString
    // Commits at or below the newest complete checkpoint are NOT
    // re-materialized: their absence means retention cleanup deleted
    // them on purpose, and rewriting them would (a) resurrect history
    // the table owner retired and (b) stamp it with sync-time mtimes,
    // collapsing timestamp time travel onto the sync moment.
    val newestCp = checkpointVersions(root).map(_._1).maxOption.getOrElse(-1L)
    var prevFiles: Seq[String] = Seq.empty
    var prevSchema: String = null
    gvs.foreach { gv =>
      val dv = gv - 1
      val files = Snapshots.manifestFiles(root, gv)
      val schemaJson = spark.read
        .parquet(files.map(f => Paths.get(root, f).toString): _*)
        .schema.json
      val target = logDir(root).resolve(commitName(dv))
      if (!Files.exists(target) && dv > newestCp) {
        val actions = Seq.newBuilder[JsonNode]
        locally {
          val ci = mapper.createObjectNode()
          val c = ci.putObject("commitInfo")
          c.put("operation", "graft-sync")
          c.put("graftVersion", gv)
          actions += ci
        }
        if (dv == 0L) {
          val protocol = mapper.createObjectNode()
          val p = protocol.putObject("protocol")
          p.put("minReaderVersion", 1)
          p.put("minWriterVersion", 2)
          actions += protocol
        }
        if (dv == 0L || schemaJson != prevSchema)
          actions += metaDataAction(tableId, schemaJson, Seq.empty)
        val removed = prevFiles.filterNot(files.contains)
        val added = files.filterNot(prevFiles.contains)
        removed.foreach { f =>
          val n = mapper.createObjectNode()
          val r = n.putObject("remove")
          r.put("path", encodePath(f))
          r.put("deletionTimestamp", Snapshots.commitTimeMillis(root, gv))
          r.put("dataChange", true)
          actions += n
        }
        added.foreach { f =>
          actions += addActionNode(root, f, Map.empty, dataChange = true,
            spark.sparkContext.hadoopConfiguration)
        }
        writeCommitFile(root, dv, actions.result(), operation = "WRITE",
          opTimestamp = Snapshots.commitTimeMillis(root, gv))
        // Timestamp time travel resolves from commit-file mtimes (Delta's
        // own mechanism): stamp the commit with the MANIFEST commit time,
        // not sync wall-clock — otherwise one late sync collapses every
        // version onto the sync moment and versionAsOf mis-resolves.
        Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(
            Snapshots.commitTimeMillis(root, gv)))
      }
      prevFiles = files
      prevSchema = schemaJson
    }
    val cur = currentVersion(root)
    val have = checkpointVersions(root).map(_._1).toSet
    (checkpointInterval.toLong to cur by checkpointInterval.toLong)
      .filterNot(have)
      .foreach(v => checkpoint(spark, root, v))
    cur
  }

  /** Commit-file write with put-if-absent semantics: the fully-written
    * temp file is renamed WITHOUT `REPLACE_EXISTING`/`ATOMIC_MOVE`, so a
    * concurrent or stale writer racing for the same version fails with
    * `FileAlreadyExistsException` instead of silently clobbering
    * committed history (the Delta commit protocol's requirement). The
    * same-filesystem rename underneath is still atomic; what NIO cannot
    * give is a fully race-free compare-and-rename (no renameat2
    * NOREPLACE), so multi-process writers to one table additionally
    * need external coordination — single-writer-per-table is the
    * documented deployment here.
    */
  /** [[writeCommitFileOnce]] plus bounded optimistic-concurrency
    * reconciliation (`retryDataConflicts = true`): when the version is
    * taken by a concurrent writer, a commit that is a BLIND APPEND
    * (only `add` / `txn` actions — no removes, no metaData/protocol,
    * no cdc) re-attempts at the next version after checking the
    * winner's commit is logically disjoint — no metaData/protocol
    * change (our data was validated against the old schema) and no
    * txn watermark for any of our appIds (a later lower watermark
    * would re-open replayed batches). Anything else refuses loudly
    * with nothing committed, exactly as before: a losing DELETE/MERGE
    * computed its rewrite from a state the winner may have changed,
    * and replaying it blindly could resurrect or drop rows. Returns
    * the version actually committed.
    */
  private[lake] def writeCommitFile(root: String, dv: Long,
                                    actions: Seq[JsonNode],
                                    operation: String = null,
                                    opTimestamp: Long = -1L,
                                    ictStart: Boolean = false,
                                    retryDataConflicts: Boolean = false,
                                    maxAttempts: Int = 5): Long = {
    var v = dv
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        writeCommitFileOnce(root, v, actions, operation, opTimestamp,
          ictStart)
        return v
      } catch {
        case e: IllegalStateException
          if retryDataConflicts && attempt < maxAttempts &&
            e.getCause.isInstanceOf[java.nio.file.FileAlreadyExistsException] =>
          val blind = actions.forall(n => n.has("add") || n.has("txn"))
          if (!blind) throw new IllegalStateException(
            s"DeltaLog: commit version $v of $root was taken by a " +
              "concurrent writer and this commit is not a blind " +
              "append (it removes files or changes metadata) — its " +
              "state basis may be stale; re-run against the current " +
              "version. Nothing was committed.", e)
          val winner = Files.readAllLines(logDir(root).resolve(commitName(v)))
            .asScala.filter(_.trim.nonEmpty).map(mapper.readTree)
          val winnerMeta = winner.exists(n =>
            n.has("metaData") || n.has("protocol"))
          val ourApps = actions.collect {
            case n if n.has("txn") => n.get("txn").path("appId").asText()
          }.toSet
          val winnerTxnClash = winner.exists(n => n.has("txn") &&
            ourApps(n.get("txn").path("appId").asText()))
          if (winnerMeta || winnerTxnClash) throw new IllegalStateException(
            s"DeltaLog: commit version $v of $root was taken by a " +
              "concurrent writer whose commit " +
              (if (winnerMeta) "changes metadata/protocol"
               else "advances a txn watermark this commit also carries") +
              " — not logically disjoint; re-run against the current " +
              "version. Nothing was committed.", e)
          v += 1
      }
    }
    v // unreachable
  }

  private def writeCommitFileOnce(root: String, dv: Long,
                                  actions: Seq[JsonNode],
                                  operation: String = null,
                                  opTimestamp: Long = -1L,
                                  ictStart: Boolean = false): Unit = {
    // In-commit timestamps (the `inCommitTimestamp` writer feature):
    // once a table carries one, every successor commit continues the
    // MONOTONIC chain — max(wall clock, predecessor + 1) — so
    // timestamp time travel survives file-mtime churn (copies, syncs,
    // retention rewrites). The chain is self-perpetuating: presence on
    // the predecessor commit is the signal, so no caller but the
    // creating one (`ictStart`) needs to know. If the predecessor JSON
    // was compacted away the chain restarts from wall clock —
    // monotonic unless the clock itself regressed.
    val prevIct: Option[Long] =
      if (dv <= 0L) None
      else {
        val prev = logDir(root).resolve(commitName(dv - 1))
        if (!Files.exists(prev)) None
        else {
          // scan for the commitInfo action and stop at the first match —
          // THIS writer leads with it, but the protocol does not mandate
          // ordering, so an external predecessor whose commitInfo sits
          // later must not silently restart the chain from wall clock
          // (which could emit an inCommitTimestamp BELOW the
          // predecessor's and mis-resolve timestamp time travel)
          val br = Files.newBufferedReader(prev)
          try Iterator.continually(br.readLine()).takeWhile(_ != null)
            .filter(_.trim.nonEmpty).map(mapper.readTree)
            .collectFirst { case n if n.has("commitInfo") =>
              n.get("commitInfo").path("inCommitTimestamp") }
            .filter(_.isNumber).map(_.asLong())
          finally br.close()
        }
      }
    val ict: Option[Long] = prevIct
      .map(p => math.max(System.currentTimeMillis(), p + 1))
      .orElse(if (ictStart) Some(System.currentTimeMillis()) else None)
    // commitInfo FIRST, the way Delta's writer lays commits out — pure
    // provenance (operation name + wall-clock), never state: replay
    // ignores it, DESCRIBE-HISTORY-style surfaces read it
    val all =
      if (operation == null && ict.isEmpty) actions
      else {
        val n = mapper.createObjectNode()
        val ci = n.putObject("commitInfo")
        ci.put("timestamp",
          if (opTimestamp >= 0L) opTimestamp else System.currentTimeMillis())
        if (operation != null) ci.put("operation", operation)
        ict.foreach(ci.put("inCommitTimestamp", _))
        ci.put("engineInfo", "graft-deltalog")
        n +: actions
      }
    val body = all.map(mapper.writeValueAsString).mkString("", "\n", "\n")
    val tmp = logDir(root).resolve(commitName(dv) + ".__tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    val target = logDir(root).resolve(commitName(dv))
    // ATOMIC put-if-absent: link(2) fails EEXIST atomically in the
    // kernel, closing the stat-then-rename window Files.move leaves
    // (rename(2) silently replaces a target created between NIO's
    // existence check and the rename — under the concurrent writers
    // [[writeCommitFile]] now supports, that was a lost-commit race).
    // Filesystems without hard links fall back to the rename form,
    // which remains safe for the documented single-writer deployment.
    try {
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException |
             _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(tmp, target)
      }
      Files.deleteIfExists(tmp)
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"DeltaLog: commit version $dv of $root already exists — " +
            "concurrent writer conflict; the committed file was NOT " +
            "overwritten", e)
    }
  }

  private def metaDataAction(tableId: String, schemaJson: String,
                             partitionCols: Seq[String],
                             configuration: Map[String, String] =
                               Map.empty): JsonNode = {
    val n = mapper.createObjectNode()
    val m = n.putObject("metaData")
    m.put("id", tableId)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", schemaJson)
    val pcs = m.putArray("partitionColumns")
    partitionCols.foreach(pcs.add)
    val cfg = m.putObject("configuration")
    configuration.foreach { case (k, v) => cfg.put(k, v) }
    n
  }

  // ------------------------------------------------------------------
  // Checkpoints
  // ------------------------------------------------------------------

  /** Classic single-file checkpoint parquet columns (PROTOCOL.md:
    * Checkpoints) — one row per action, the action in its column, nulls
    * elsewhere. `remove` and `txn` are emitted as all-null columns so
    * the file carries the canonical five-column shape external readers
    * expect; state reconstruction needs no tombstones.
    */
  private val checkpointSchema = StructType(Seq(
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType, true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("tags", MapType(StringType, StringType, true)),
      // appended LAST so existing ordinal reads stay valid
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", LongType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType, true))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType, true)),
      StructField("createdTime", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType)))))))

  /** [[checkpointSchema]] plus the V2-checkpoint actions (appended LAST
    * so classic ordinal reads stay valid): `checkpointMetadata` and
    * `sidecar` (PROTOCOL.md "V2 Checkpoints"). Classic files read with
    * this schema simply carry the two as null columns.
    */
  private val checkpointSchemaV2 = StructType(checkpointSchema.fields ++ Seq(
    StructField("checkpointMetadata", StructType(Seq(
      StructField("version", LongType)))),
    StructField("sidecar", StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType))))))

  /** Every action row of a checkpoint in [[checkpointSchemaV2]] shape:
    * classic parts read directly; a V2 top file (parquet or JSON
    * line-actions) contributes its own rows PLUS those of every sidecar
    * parquet it references under `_delta_log/_sidecars/`.
    */
  private def checkpointActionsDF(spark: SparkSession, root: String,
                                  ref: CpRef): DataFrame = ref match {
    case ClassicCp(_, parts) =>
      spark.read.schema(checkpointSchemaV2)
        .parquet(parts.map(_.toString): _*)
    case V2Cp(_, top) =>
      val topDF =
        if (top.toString.endsWith(".parquet"))
          spark.read.schema(checkpointSchemaV2).parquet(top.toString)
        else
          spark.createDataFrame(
            spark.sparkContext.parallelize(jsonCheckpointRows(top), 1),
            checkpointSchemaV2)
      val sidecars = topDF.where(col("sidecar").isNotNull)
        .select(col("sidecar.path")).collect().map(_.getString(0)).toSeq
      val sideDFs = sidecars.map(p =>
        spark.read.schema(checkpointSchemaV2)
          .parquet(logDir(root).resolve("_sidecars").resolve(p).toString))
      (Seq(topDF) ++ sideDFs).reduce(_ unionByName _)
  }

  /** JSON-variant V2 top file → [[checkpointSchemaV2]] rows (driver-side
    * — a V2 JSON top holds non-file actions and sidecar references, or
    * the inline file actions of a SMALL table).
    */
  private def jsonCheckpointRows(top: Path): Seq[Row] = {
    def nullRow = Array.fill[Any](7)(null)
    Files.readAllLines(top).asScala.filter(_.trim.nonEmpty).map { line =>
      val n = mapper.readTree(line)
      val cells = nullRow
      if (n.has("txn")) {
        val t = n.get("txn")
        cells(0) = Row(t.path("appId").asText(null),
          if (t.path("version").isNumber) t.path("version").asLong()
          else null)
      } else if (n.has("add")) {
        val a = n.get("add")
        val pvNode = a.path("partitionValues")
        val pv =
          if (pvNode.isObject)
            pvNode.properties().asScala.map(e => e.getKey ->
              (if (e.getValue.isNull) null else e.getValue.asText())).toMap
          else Map.empty[String, String]
        val dvRow = dvFromNode(a.path("deletionVector")).map(d =>
          Row(d.storageType, d.pathOrInlineDv, d.offset.orNull,
            d.sizeInBytes, d.cardinality)).orNull
        cells(1) = Row(a.path("path").asText(), pv,
          if (a.path("size").isNumber) a.path("size").asLong() else null,
          if (a.path("modificationTime").isNumber)
            a.path("modificationTime").asLong()
          else null,
          if (a.path("dataChange").isBoolean)
            a.path("dataChange").asBoolean()
          else null,
          if (a.path("stats").isTextual) a.path("stats").asText() else null,
          null, dvRow)
      } else if (n.has("remove")) {
        val r = n.get("remove")
        cells(2) = Row(r.path("path").asText(),
          if (r.path("deletionTimestamp").isNumber)
            r.path("deletionTimestamp").asLong()
          else null,
          if (r.path("dataChange").isBoolean)
            r.path("dataChange").asBoolean()
          else null)
      } else if (n.has("metaData")) {
        val m = n.get("metaData")
        val pc = m.path("partitionColumns")
        val pcs =
          if (pc.isArray) pc.elements().asScala.map(_.asText()).toSeq
          else Seq.empty[String]
        val cfgNode = m.path("configuration")
        val cfg =
          if (cfgNode.isObject)
            cfgNode.properties().asScala
              .map(e => e.getKey -> e.getValue.asText(null)).toMap
          else Map.empty[String, String]
        cells(3) = Row(m.path("id").asText(null),
          m.path("name").asText(null), m.path("description").asText(null),
          Row(m.path("format").path("provider").asText("parquet"),
            Map.empty[String, String]),
          m.path("schemaString").asText(null), pcs, cfg, null)
      } else if (n.has("protocol")) {
        val p = n.get("protocol")
        def feats(key: String): Seq[String] = {
          val f = p.path(key)
          if (f.isArray) f.elements().asScala.map(_.asText()).toSeq else null
        }
        cells(4) = Row(p.path("minReaderVersion").asInt(1),
          p.path("minWriterVersion").asInt(2),
          feats("readerFeatures"), feats("writerFeatures"))
      } else if (n.has("checkpointMetadata")) {
        cells(5) = Row(
          n.get("checkpointMetadata").path("version").asLong(-1L))
      } else if (n.has("sidecar")) {
        val s = n.get("sidecar")
        cells(6) = Row(s.path("path").asText(),
          if (s.path("sizeInBytes").isNumber)
            s.path("sizeInBytes").asLong()
          else null,
          if (s.path("modificationTime").isNumber)
            s.path("modificationTime").asLong()
          else null)
      }
      Row.fromSeq(cells.toIndexedSeq)
    }.toSeq
  }

  /** Write the parquet checkpoint for `version` (replayed state: one
    * protocol row, one metaData row, one row per active file with
    * `dataChange=false` — the checkpoint convention) plus the
    * `_last_checkpoint` pointer `{"version":v,"size":n}`. Idempotent:
    * an existing checkpoint for `version` is left untouched (the
    * pointer still refreshes to the newest checkpoint present).
    */
  def checkpoint(spark: SparkSession, root: String, version: Long): Unit = {
    val target = logDir(root).resolve(checkpointName(version))
    var writtenRows = -1L
    if (!Files.exists(target)) {
      val st = replay(spark, root, version)
      val schemaJson = st.schema.map(_.json).getOrElse(
        throw new IllegalStateException(
          s"DeltaLog.checkpoint: no metaData in $root log at $version"))
      val protoRow = Row(null, null, null, null,
        Row(st.minReaderVersion, st.minWriterVersion,
          if (st.readerFeatures.isEmpty) null else st.readerFeatures,
          if (st.writerFeatures.isEmpty) null else st.writerFeatures))
      // configuration MUST ride the checkpoint: replay takes it from
      // here once the JSON prefix is trimmed — dropping it silently
      // un-declares CDF/appendOnly/constraints/mapping mode/ICT
      val metaRow = Row(null, null, null,
        Row(st.tableId, null, null, Row("parquet", Map.empty[String, String]),
          schemaJson, st.partitionColumns, st.configuration, null),
        null)
      val addRows = st.files.map { case (path, pv) =>
        val dvRow = st.fileDvs.get(path).map(d =>
          Row(d.storageType, d.pathOrInlineDv, d.offset.orNull,
            d.sizeInBytes, d.cardinality)).orNull
        Row(null,
          Row(encodePath(path), pv, st.fileSizes.getOrElse(path, 0L),
            st.fileModTimes.getOrElse(path, 0L), false,
            st.fileStats.getOrElse(path, null), null, dvRow),
          null, null, null)
      }
      // txn watermarks survive compaction (Delta checkpoints carry them)
      val txnRows = st.txnVersions.toSeq.sortBy(_._1).map { case (app, ver) =>
        Row(Row(app, ver), null, null, null, null)
      }
      val rows = Seq(protoRow, metaRow) ++ txnRows ++ addRows
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), checkpointSchema)
      val part = writeSingleParquet(df, root, "graft-delta-ckpt")
      Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
      writtenRows = rows.size.toLong
    }
    // _last_checkpoint is a HINT (readers discover by listing); keep it
    // pointing at the newest checkpoint present.
    val newest = checkpointVersions(root).map(_._1).max
    val n = mapper.createObjectNode()
    n.put("version", newest)
    // row count is known when this call wrote the newest checkpoint;
    // otherwise one parquet read (footer-sized file) recovers it
    n.put("size",
      if (newest == version && writtenRows >= 0L) writtenRows
      else countCheckpointRows(spark, root, newest))
    val tmp = logDir(root).resolve("_last_checkpoint.__tmp")
    Files.write(tmp, mapper.writeValueAsString(n).getBytes("UTF-8"))
    Files.move(tmp, logDir(root).resolve("_last_checkpoint"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def countCheckpointRows(spark: SparkSession, root: String,
                                  v: Long): Long = {
    val files = checkpointVersions(root).find(_._1 == v).get._2
    spark.read.parquet(files.map(_.toString): _*).count()
  }

  /** Declare the `v2Checkpoint` table feature (one protocol-upgrade
    * commit, Delta's own shape: version floors 3/7 with every
    * legacy-implied feature enumerated so external feature-gated
    * writers keep honoring them). No-op when already declared.
    * [[checkpointV2]] requires it — writing a V2 checkpoint on a table
    * whose protocol does not announce the feature would strand readers
    * that list the log expecting classic checkpoints only.
    */
  def enableV2Checkpoints(spark: SparkSession, root: String): Long = {
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritable(st, "enableV2Checkpoints")
    if (st.minReaderVersion >= 3 && st.readerFeatures.contains("v2Checkpoint")
        && st.writerFeatures.contains("v2Checkpoint")) return v
    val n = mapper.createObjectNode()
    val p = n.putObject("protocol")
    p.put("minReaderVersion", 3)
    p.put("minWriterVersion", 7)
    val rf = p.putArray("readerFeatures")
    // legacy minReaderVersion 2 implies columnMapping — enumerate it
    ((if (st.minReaderVersion == 2) Seq("columnMapping") else Seq.empty) ++
      st.readerFeatures :+ "v2Checkpoint").distinct.foreach(rf.add)
    val wf = p.putArray("writerFeatures")
    (legacyWriterFeatures(st.minWriterVersion) ++ st.writerFeatures :+
      "v2Checkpoint").distinct.foreach(wf.add)
    writeCommitFile(root, v + 1, Seq(n), operation = "UPGRADE PROTOCOL")
    v + 1
  }

  /** Write a V2 CHECKPOINT for `version` (PROTOCOL.md "V2
    * Checkpoints") — the form whose FILE ACTIONS live in sidecar
    * parquet files under `_delta_log/_sidecars/`, split at
    * `maxAddsPerSidecar` rows: a 100 TB table's hundred-million-action
    * state neither serializes through one file nor re-writes whole on
    * every checkpoint cadence. The top
    * `<v>.checkpoint.<uuid>.parquet` carries the non-file actions —
    * protocol, metaData, txn watermarks (the r15 lesson: losing them
    * breaks exactly-once sinks after compaction), `checkpointMetadata`
    * — plus one `sidecar` action per sidecar file. The reader side
    * ([[checkpointActionsDF]]) already consumes this shape (q262);
    * this is its writer. Refreshes `_last_checkpoint`. Idempotent per
    * version: an existing V2 top for `version` is left untouched.
    */
  def checkpointV2(spark: SparkSession, root: String, version: Long,
                   maxAddsPerSidecar: Long = 1000000L): Unit = {
    require(maxAddsPerSidecar >= 1L,
      s"DeltaLog.checkpointV2: maxAddsPerSidecar >= 1")
    if (checkpointRefs(root).exists {
      case V2Cp(v, _) => v == version
      case _ => false
    }) return
    val st = replay(spark, root, version)
    require(st.minReaderVersion >= 3 &&
      st.readerFeatures.contains("v2Checkpoint"),
      s"DeltaLog.checkpointV2: $root does not declare the v2Checkpoint " +
        "reader feature — run enableV2Checkpoints first")
    val schemaJson = st.schema.map(_.json).getOrElse(
      throw new IllegalStateException(
        s"DeltaLog.checkpointV2: no metaData in $root log at $version"))
    // rows in checkpointSchemaV2 shape:
    // (txn, add, remove, metaData, protocol, checkpointMetadata, sidecar)
    def row(txn: Row = null, add: Row = null, meta: Row = null,
            proto: Row = null, cpMeta: Row = null, side: Row = null) =
      Row(txn, add, null, meta, proto, cpMeta, side)
    val addRows = st.files.map { case (path, pv) =>
      val dvRow = st.fileDvs.get(path).map(d =>
        Row(d.storageType, d.pathOrInlineDv, d.offset.orNull,
          d.sizeInBytes, d.cardinality)).orNull
      row(add = Row(encodePath(path), pv, st.fileSizes.getOrElse(path, 0L),
        st.fileModTimes.getOrElse(path, 0L), false,
        st.fileStats.getOrElse(path, null), null, dvRow))
    }
    val sidecarDir = logDir(root).resolve("_sidecars")
    Files.createDirectories(sidecarDir)
    val sidecarRows = addRows.grouped(
      math.min(maxAddsPerSidecar, Int.MaxValue.toLong).toInt)
      .map { batch =>
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(batch, 1), checkpointSchemaV2)
        val part = writeSingleParquet(df, root, "graft-delta-ckpt-sc")
        val name = s"${java.util.UUID.randomUUID()}.parquet"
        val target = sidecarDir.resolve(name)
        Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
        row(side = Row(name, Files.size(target),
          Files.getLastModifiedTime(target).toMillis))
      }.toSeq
    val protoRow = row(proto =
      Row(st.minReaderVersion, st.minWriterVersion,
        if (st.readerFeatures.isEmpty) null else st.readerFeatures,
        if (st.writerFeatures.isEmpty) null else st.writerFeatures))
    val metaRow = row(meta =
      Row(st.tableId, null, null, Row("parquet", Map.empty[String, String]),
        schemaJson, st.partitionColumns, st.configuration, null))
    val txnRows = st.txnVersions.toSeq.sortBy(_._1).map { case (app, ver) =>
      row(txn = Row(app, ver))
    }
    val cpMetaRow = row(cpMeta = Row(version))
    val topRows = Seq(protoRow, metaRow, cpMetaRow) ++ txnRows ++ sidecarRows
    val topDf = spark.createDataFrame(
      spark.sparkContext.parallelize(topRows, 1), checkpointSchemaV2)
    val topPart = writeSingleParquet(topDf, root, "graft-delta-ckpt-v2")
    val topName =
      f"$version%020d.checkpoint.${java.util.UUID.randomUUID()}.parquet"
    Files.move(topPart, logDir(root).resolve(topName),
      StandardCopyOption.ATOMIC_MOVE)
    val n = mapper.createObjectNode()
    n.put("version", version)
    n.put("size", (topRows.size + addRows.size).toLong)
    val tmp = logDir(root).resolve("_last_checkpoint.__tmp")
    Files.write(tmp, mapper.writeValueAsString(n).getBytes("UTF-8"))
    Files.move(tmp, logDir(root).resolve("_last_checkpoint"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Post-commit auto-checkpoint (`delta.checkpointInterval`): once a
    * table declares the property, every data commit measures how far
    * the JSON tail has grown past the newest checkpoint and compacts
    * when the lag reaches the interval. The LAG rule — not Delta's
    * `version % N` — survives metadata-only commits, external writers
    * and reclaimed prefixes without ever leaving a long uncompacted
    * tail. Opt-in by design: a checkpoint costs a replay + a parquet
    * write, which tables a few commits long never amortize, so
    * undeclared tables keep the explicit [[checkpoint]] workflow.
    * Decisions read the PRE-commit state the caller already replayed
    * (zero added IO); a commit that itself declares the property or
    * the `v2Checkpoint` feature (which selects the sidecar form here)
    * takes effect from its successor.
    */
  /** Post-commit maintenance seam, called by every data-mutating entry
    * point with the PRE-commit state the caller already replayed:
    * auto-checkpoint ([[maybeAutoCheckpoint]]) and — when the table
    * declares `delta.symlinkFormatManifest.enabled` (Delta's own
    * auto-manifest property) — regeneration of the symlink manifests
    * so external whole-file readers always see the just-committed
    * snapshot. DV-writing DML refuses UPFRONT on manifest-enabled
    * tables ([[deleteWhereLongDV]]), the property cannot be enabled
    * over live DVs or absolute-path adds ([[setTableProperties]]),
    * [[restore]] refuses before its commit when the restored snapshot
    * would reinstate DVs under the property, and [[shallowClone]]
    * refuses to carry the property onto absolute-path adds — so the
    * regeneration here never throws after a durable commit. Restore
    * passes the POST-restore configuration (the target's), so a
    * restore that flips the property on or off is maintained by what
    * it restored, not by the state it replaced.
    */
  /** Minimum age an unreferenced checkpoint sidecar must reach before
    * [[cleanUpExpiredLogs]] may collect it, independent of the
    * caller's retention — an in-flight [[checkpointV2]] lands its
    * sidecars BEFORE its top, so a zero-retention sweep racing it
    * must not see them as orphans.
    */
  private[lake] val SidecarSweepGraceMs: Long = 15L * 60L * 1000L

  private def manifestEnabled(cfg: Map[String, String]): Boolean =
    cfg.get("delta.symlinkFormatManifest.enabled")
      .exists(_.trim.equalsIgnoreCase("true"))

  private def postCommit(spark: SparkSession, root: String,
                         st: LogState, committed: Long): Unit = {
    maybeAutoCheckpoint(spark, root, st)
    if (manifestEnabled(st.configuration))
      // incremental: only the partition directories THIS WRITER'S
      // committed version's add/remove set touched are rewritten
      // (reading the one commit JSON is O(commit), never O(table)); a
      // full-table regeneration per commit was O(all partitions) in
      // driver file writes — the r19-flagged scale killer. The
      // version is the CALLER'S, not currentVersion(root): under the
      // concurrent appends [[writeCommitFile]] reconciles, reading
      // the newest version here could regenerate a RACING writer's
      // partitions and leave this commit's manifest stale.
      regenerateManifests(spark, root,
        Some(touchedPartitionDirs(root, committed)))
  }

  private def maybeAutoCheckpoint(spark: SparkSession, root: String,
                                  st: LogState): Unit =
    st.configuration.get("delta.checkpointInterval")
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .filter(_ >= 1L).foreach { iv =>
        val cur = currentVersion(root)
        val newest =
          checkpointRefs(root).map(_.version).maxOption.getOrElse(-1L)
        if (cur > 0L && cur - newest >= iv) {
          if (st.readerFeatures.contains("v2Checkpoint"))
            checkpointV2(spark, root, cur)
          else checkpoint(spark, root, cur)
        }
      }

  // ------------------------------------------------------------------
  // Reader: _delta_log → DataFrame
  // ------------------------------------------------------------------

  /** Replayed log state at a version: declared schema + partition
    * columns (from `metaData`), protocol floor, table id, and the
    * active table-relative file paths in activation order with their
    * partition values (null map values = null partition value).
    */
  /** `add.deletionVector` descriptor (PROTOCOL.md: Deletion Vector
    * Descriptor Schema): `storageType` `u` (UUID-named file beside the
    * table, path suffix = optional prefix + 20-char Z85 UUID), `i`
    * (whole blob Z85-inlined in `pathOrInlineDv`), or `p` (absolute
    * path — out of scope here, like absolute data paths).
    */
  private[lake] case class DvDescriptor(storageType: String,
                                        pathOrInlineDv: String,
                                        offset: Option[Long],
                                        sizeInBytes: Int,
                                        cardinality: Long) {
    /** The serialized RoaringBitmapArray bytes, resolving `u` storage
      * under `root` (CRC-verified).
      */
    def readBytes(root: String): Array[Byte] = storageType match {
      case "i" => Dv.z85Decode(pathOrInlineDv)
      case "u" =>
        val suffix = pathOrInlineDv.takeRight(20)
        val prefix = pathOrInlineDv.dropRight(20)
        val uuid = Dv.uuidFromBytes(Dv.z85Decode(suffix))
        val dir =
          if (prefix.isEmpty) Paths.get(root)
          else Paths.get(root, prefix)
        Dv.readBlob(dir.resolve(Dv.dvFileName(uuid)),
          offset.getOrElse(1L), sizeInBytes)
      case "p" =>
        // absolute-path storage (what shallow clones record so the
        // clone's DVs keep resolving to the SOURCE's sidecars)
        val path = decodePath(pathOrInlineDv)
        require(path.startsWith("/"),
          s"DeltaLog: storageType 'p' requires an absolute path, got " +
            s"'$pathOrInlineDv'")
        Dv.readBlob(Paths.get(path), offset.getOrElse(1L), sizeInBytes)
      case other => throw new IllegalArgumentException(
        s"DeltaLog: deletion vector storageType '$other' unsupported " +
          "(u, i and p only)")
    }

    /** Decode the position set, resolving `u` storage under `root`. */
    def read(root: String): Dv.PositionSet =
      Dv.deserialize(readBytes(root))

    /** Table-relative sidecar path of a `u`-storage descriptor (the
      * optional prefix + the UUID-derived blob name) — the single
      * rendering restore's existence check, vacuum's active-DV keep
      * set and shallowClone's re-addressing all share.
      */
    def sidecarRel: String = {
      require(storageType == "u",
        s"DeltaLog: sidecarRel is defined for 'u' storage, not " +
          s"'$storageType'")
      val prefix = pathOrInlineDv.dropRight(20)
      val uuid = Dv.uuidFromBytes(Dv.z85Decode(pathOrInlineDv.takeRight(20)))
      (if (prefix.isEmpty) "" else prefix + "/") + Dv.dvFileName(uuid)
    }
  }

  private def dvFromNode(n: JsonNode): Option[DvDescriptor] =
    if (n == null || !n.isObject) None
    else Some(DvDescriptor(
      n.path("storageType").asText(),
      n.path("pathOrInlineDv").asText(),
      if (n.path("offset").isNumber) Some(n.path("offset").asLong())
      else None,
      n.path("sizeInBytes").asInt(),
      n.path("cardinality").asLong()))

  private case class LogState(
    schema: Option[StructType],
    partitionColumns: Seq[String],
    minReaderVersion: Int,
    minWriterVersion: Int,
    readerFeatures: Seq[String],
    writerFeatures: Seq[String],
    configuration: Map[String, String],
    tableId: String,
    files: Seq[(String, Map[String, String])],
    fileSizes: Map[String, Long],
    fileModTimes: Map[String, Long],
    fileStats: Map[String, String],
    fileDvs: Map[String, DvDescriptor],
    txnVersions: Map[String, Long])

  /** Reader features this implementation genuinely honors when named by
    * a protocol-3 table: `deletionVectors` (full read support — add
    * actions carrying DV descriptors have the deleted positions
    * filtered by `_metadata.row_index`, see [[assembleFiles]]),
    * `timestampNtz` (plain type support — the declared-schema read
    * handles TIMESTAMP_NTZ like any other type) and
    * `vacuumProtocolCheck` (constrains vacuum, not reads).
    * `columnMapping` is honored in modes none/absent (identity) and
    * `name` (reads resolve `delta.columnMapping.physicalName` from the
    * schema metadata; mapped tables are read-only here); `v2Checkpoint`
    * tables replay from the V2 top file + its sidecars (see
    * [[checkpointActionsDF]]). Mode `id` and anything else would make a
    * plain replay return WRONG ROWS, so the refusal names the specific
    * feature.
    */
  private val supportedReaderFeatures: Set[String] =
    Set("deletionVectors", "timestampNtz", "vacuumProtocolCheck",
      "v2Checkpoint", "typeWidening", "variantType")

  /** Does the schema hold a VARIANT anywhere (the `variantType`
    * feature's trigger)? Matched by typeName so the check survives
    * VariantType's representation across Spark versions.
    */
  private def hasVariantType(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.exists(f => hasVariantType(f.dataType))
    case a: ArrayType => hasVariantType(a.elementType)
    case m: MapType =>
      hasVariantType(m.keyType) || hasVariantType(m.valueType)
    case other => other.typeName == "variant"
  }

  /** The typeWidening changes this reader actually implements — the
    * bit-exact subset (integral chain, float→double). The FEATURE
    * admits more (date→timestampNtz, int→double, decimal growth);
    * [[validateTypeChanges]] refuses those upfront so an external
    * table never passes the gate and then crashes mid-scan.
    */
  private val supportedWidenings: Set[(String, String)] = Set(
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"), ("float", "double"))

  private def validateTypeChanges(root: String,
                                  schema: StructType): Unit = {
    def walk(dt: DataType): Unit = dt match {
      case s: StructType => s.fields.foreach { f =>
        if (f.metadata.contains("delta.typeChanges")) {
          val arr =
            try f.metadata.getMetadataArray("delta.typeChanges")
            catch { case _: Exception => Array.empty[Metadata] }
          arr.foreach { m =>
            val from =
              if (m.contains("fromType")) m.getString("fromType") else "?"
            val to =
              if (m.contains("toType")) m.getString("toType") else "?"
            require(supportedWidenings((from, to)),
              s"DeltaLog: table $root records a type change " +
                s"$from → $to on column ${f.name} — this reader widens " +
                "only the bit-exact subset (byte/short/int → wider " +
                "integral, float → double); reading would return " +
                "wrong rows or crash mid-scan")
          }
        }
        walk(f.dataType)
      }
      case a: ArrayType => walk(a.elementType)
      case m: MapType => walk(m.keyType); walk(m.valueType)
      case _ => ()
    }
    walk(schema)
  }

  private def mappingMode(st: LogState): String =
    st.configuration.getOrElse("delta.columnMapping.mode", "none")

  /** Loud, SPECIFIC refusal for protocol surfaces this reader lacks —
    * `minReaderVersion > 1` alone is not a reason to refuse: a
    * protocol-3 table whose feature set is fully supported opens.
    * Column mapping: `none` trivially readable, `name` readable (reads
    * resolve physical column names from the schema metadata — see
    * [[physicalTopLevel]]), `id` readable (reads match by the parquet
    * footer's field ids via `parquet.field.id` requested-schema
    * metadata — see [[physDataType]]); any future mode refuses
    * naming itself.
    */
  private def validateReaderSupport(root: String, st: LogState): Unit = {
    val mode = mappingMode(st)
    val mappingOk = mode == "none" || mode == "name" || mode == "id"
    st.minReaderVersion match {
      case v if v <= 1 => ()
      case 2 =>
        require(mappingOk,
          s"DeltaLog: table $root requires columnMapping mode '$mode' " +
            "which this reader lacks (none, name and id supported)")
      case 3 =>
        val unsupported = st.readerFeatures.filterNot { f =>
          supportedReaderFeatures(f) || (f == "columnMapping" && mappingOk)
        }
        require(unsupported.isEmpty,
          s"DeltaLog: table $root requires reader feature(s) " +
            s"${unsupported.sorted.mkString(", ")} which this reader lacks" +
            (if (st.readerFeatures.contains("columnMapping") && !mappingOk)
               s" (columnMapping mode '$mode'; none, name and id supported)"
             else ""))
      case v =>
        require(false,
          s"DeltaLog: table $root requires minReaderVersion $v, beyond " +
            "this reader's protocol support (max 3)")
    }
    if (st.readerFeatures.contains("typeWidening"))
      st.schema.foreach(validateTypeChanges(root, _))
  }

  private val PhysicalNameKey = "delta.columnMapping.physicalName"

  /** Top-level logical → physical field mapping under column mapping
    * (PROTOCOL.md: data files store columns under
    * `delta.columnMapping.physicalName`; the declared schema carries the
    * mapping in field metadata). Fields without a physicalName keep
    * their logical name. NESTED mappings resolve through
    * [[physDataType]]/[[toLogicalField]] — this map is only the
    * top-level column-reference layer (selects, stats keys, partition
    * values).
    */
  private def physicalTopLevel(schema: StructType): Map[String, String] =
    schema.fields.map { f =>
      f.name -> (if (f.metadata.contains(PhysicalNameKey))
                   f.metadata.getString(PhysicalNameKey)
                 else f.name)
    }.toMap

  private val ColumnIdKey = "delta.columnMapping.id"

  /** Whether `dt` (or anything nested inside it) carries a
    * physicalName mapping — i.e. a physical-named scan changes NESTED
    * field names too, and the logical projection must CAST-rename
    * (struct casts are positional) instead of a plain alias.
    */
  private def nestedMapped(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.exists(f =>
      f.metadata.contains(PhysicalNameKey) || nestedMapped(f.dataType))
    case a: ArrayType => nestedMapped(a.elementType)
    case m: MapType => nestedMapped(m.keyType) || nestedMapped(m.valueType)
    case _ => false
  }

  /** Rename struct fields at EVERY level to their physicalName
    * (identity where unmapped); `withIds` additionally stamps
    * `parquet.field.id` from `delta.columnMapping.id` at every level —
    * the id-mode scan/write shape, where Spark's parquet reader
    * (fieldId.read.enabled, set by GraftSession) matches columns by
    * the footer's FIELD IDS recursively and the writer records them.
    * Nested fields missing an id under id mode refuse loudly — the
    * mapping is unresolvable.
    */
  private def physDataType(dt: DataType, withIds: Boolean): DataType =
    dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val phys = if (f.metadata.contains(PhysicalNameKey))
          f.metadata.getString(PhysicalNameKey) else f.name
        val mb = new MetadataBuilder()
        if (withIds) {
          require(f.metadata.contains(ColumnIdKey),
            s"DeltaLog: id-mode field '${f.name}' lacks $ColumnIdKey " +
              "schema metadata — the mapping is unresolvable")
          mb.putLong("parquet.field.id", f.metadata.getLong(ColumnIdKey))
        }
        StructField(phys, physDataType(f.dataType, withIds), f.nullable,
          mb.build())
      })
      case a: ArrayType =>
        a.copy(elementType = physDataType(a.elementType, withIds))
      case m: MapType => m.copy(keyType = physDataType(m.keyType, withIds),
        valueType = physDataType(m.valueType, withIds))
      case other => other
    }

  /** The logical shape with mapping metadata stripped at every level —
    * the cast target that renames a scanned physical-named nested
    * column back to its logical field names. Fully NULLABLE: a cast to
    * a non-nullable nested field fails resolution when the scan
    * relaxed nullability, and nullability enforcement is the
    * invariants layer's job, not the rename's.
    */
  private def cleanDataType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, cleanDataType(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(cleanDataType(a.elementType),
      containsNull = true)
    case m: MapType => MapType(cleanDataType(m.keyType),
      cleanDataType(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Nullable-lenient copy of a (physical) type, metadata preserved —
    * the WRITE-side cast target ([[toPhysicalField]]); same rationale
    * as [[cleanDataType]]'s nullability note.
    */
  private def nullableDataType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = nullableDataType(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(nullableDataType(a.elementType),
      containsNull = true)
    case m: MapType => MapType(nullableDataType(m.keyType),
      nullableDataType(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Logical projection of one scanned PHYSICAL-named column: a plain
    * alias when the type nests no mapping, a cast-rename (positional
    * over struct fields, element-wise through arrays/maps) when it
    * does.
    */
  private def toLogicalField(f: StructField,
      physName: String): org.apache.spark.sql.Column =
    if (nestedMapped(f.dataType))
      col(physName).cast(cleanDataType(f.dataType)).as(f.name)
    else col(physName).as(f.name)

  /** Physical projection of one LOGICAL column about to be written:
    * alias when flat; cast to the physical-named nested type when
    * mapped. Id mode's NESTED `parquet.field.id` stamps ride the cast
    * target's field metadata (the parquet writer reads them per
    * nested StructField); the TOP-level id is stamped separately by
    * [[stampFieldIds]].
    */
  private def toPhysicalField(withIds: Boolean, f: StructField,
      physName: String): org.apache.spark.sql.Column =
    if (nestedMapped(f.dataType))
      col(f.name).cast(nullableDataType(physDataType(f.dataType, withIds)))
        .as(physName)
    else col(f.name).as(physName)

  /** The read-side (scanSchema, logical→physical name map) pair for a
    * table's mapping mode: identity for `none`, recursively renamed
    * fields for `name`, renamed + field-id-stamped fields for `id`.
    */
  private def readSchemaFor(st: LogState,
      dataSchema: StructType): (StructType, Map[String, String]) =
    mappingMode(st) match {
      case "name" =>
        (physDataType(dataSchema, withIds = false).asInstanceOf[StructType],
          physicalTopLevel(dataSchema))
      case "id" =>
        (physDataType(dataSchema, withIds = true).asInstanceOf[StructType],
          physicalTopLevel(dataSchema))
      case _ =>
        (dataSchema, dataSchema.fieldNames.map(n => n -> n).toMap)
    }

  /** Read `paths` with `dataSchema`, honoring column mapping: the
    * parquet scan uses PHYSICAL field names (name mode) or field-id
    * matching (id mode); the returned DataFrame carries the LOGICAL
    * names (same order).
    */
  private def readDataFiles(spark: SparkSession, st: LogState,
                            dataSchema: StructType,
                            paths: Seq[String]): DataFrame = {
    if (mappingMode(st) == "none")
      spark.read.schema(dataSchema).parquet(paths: _*)
    else {
      val (scanSchema, physMap) = readSchemaFor(st, dataSchema)
      spark.read.schema(scanSchema).parquet(paths: _*)
        .select(dataSchema.fields.map(f =>
          toLogicalField(f, physMap.getOrElse(f.name, f.name)))
          .toIndexedSeq: _*)
    }
  }

  /** WRITE-path mapping gate: modes none, name and id are writable
    * (name/id writes resolve logical→physical at the IO boundary, id
    * writes additionally stamp `parquet.field.id` on new files); any
    * future mode refuses loudly naming itself.
    */
  private def requireWritableMapping(st: LogState, op: String): Unit = {
    val mode = mappingMode(st)
    require(mode == "none" || mode == "name" || mode == "id",
      s"DeltaLog.$op: columnMapping mode '$mode' tables are read-only " +
        "through this bridge (modes none, name and id are writable)")
  }

  /** PHYSICAL-name-keyed parquet field ids of a mapped schema. */
  private def fieldIdsOf(schema: StructType): Map[String, Long] = {
    val phys = physicalTopLevel(schema)
    schema.fields.collect { case f if f.metadata.contains(ColumnIdKey) =>
      phys(f.name) -> f.metadata.getLong(ColumnIdKey)
    }.toMap
  }

  /** PHYSICAL-name-keyed parquet field ids for id-mode writes (empty
    * otherwise): new files must carry the ids the table's readers
    * match by, or they read as all-NULL.
    */
  private def physFieldIds(st: LogState,
      schema: StructType): Map[String, Long] =
    if (mappingMode(st) != "id") Map.empty
    else fieldIdsOf(schema)

  /** Assign column-mapping metadata — `delta.columnMapping.id` above
    * `startId` plus a fresh `col-<uuid>` physicalName — to every field
    * lacking it at EVERY nesting level (table creation with mapping
    * on, and the new columns of a mapped schema evolution; the
    * protocol maps nested struct fields individually). Returns the
    * schema and the new maxColumnId.
    */
  private def assignMapping(schema: StructType,
      startId: Long): (StructType, Long) = {
    var next = startId
    def assignDt(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(assignField))
      case a: ArrayType => a.copy(elementType = assignDt(a.elementType))
      case m: MapType => m.copy(keyType = assignDt(m.keyType),
        valueType = assignDt(m.valueType))
      case other => other
    }
    def assignField(f: StructField): StructField = {
      val withMeta =
        if (f.metadata.contains(ColumnIdKey)) f
        else {
          next += 1
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(ColumnIdKey, next)
            .putString(PhysicalNameKey,
              s"col-${java.util.UUID.randomUUID()}")
            .build())
        }
      withMeta.copy(dataType = assignDt(withMeta.dataType))
    }
    (StructType(schema.fields.map(assignField)), next)
  }

  /** Stamp `parquet.field.id` metadata onto a PHYSICAL-named batch
    * about to be written (identity when `fieldIds` is empty — i.e.,
    * everything but id-mode tables). Spark's parquet writer
    * (fieldId.write.enabled, set by GraftSession) then records the ids
    * in the footer.
    */
  private def stampFieldIds(df: DataFrame,
      fieldIds: Map[String, Long]): DataFrame =
    if (fieldIds.isEmpty) df
    else df.select(df.columns.map { c =>
      fieldIds.get(c) match {
        case Some(id) => col(c).as(c, new MetadataBuilder()
          .putLong("parquet.field.id", id).build())
        case None => col(c)
      }
    }.toIndexedSeq: _*)

  /** Logical → physical rename map for the WRITE paths: empty (identity)
    * when unmapped, the [[physicalTopLevel]] table under name mode.
    */
  private def physicalWriteMap(st: LogState,
                               schema: StructType): Map[String, String] =
    if (mappingMode(st) == "none") Map.empty
    else physicalTopLevel(schema)

  /** Rename a batch about to be WRITTEN into a mapped table to its
    * PHYSICAL field names at every nesting level (identity when
    * unmapped) — new parquet must store the same physical names/ids
    * the table's existing files do or every mapped reader sees the new
    * rows as all-NULL. Columns NOT in `schema` (e.g. `_change_type` on
    * a CDC batch) pass through untouched.
    */
  private def toPhysicalDf(st: LogState, schema: StructType,
                           df: DataFrame): DataFrame = {
    val phys = physicalWriteMap(st, schema)
    if (phys.isEmpty) df
    else stampFieldIds(
      df.select(df.columns.toIndexedSeq.map { c =>
        schema.fields.find(_.name == c) match {
          case Some(f) =>
            toPhysicalField(mappingMode(st) == "id", f,
              phys.getOrElse(c, c))
          case None => col(c)
        }
      }: _*),
      physFieldIds(st, schema))
  }

  /** One replayed log action in the distributed reconstruction's common
    * shape (checkpoint adds and JSON-tail adds/removes both map here).
    */
  private case class ActRow(version: Long, isAdd: Boolean, path: String,
                            pv: Map[String, String], size: Option[Long],
                            mod: Option[Long], stats: Option[String],
                            dv: Option[String])

  /** Checkpoint byte size beyond which [[replay]] reconstructs FILE
    * state distributed instead of folding every action through
    * driver-side maps (~16 MiB ≈ low hundreds of thousands of files).
    * The non-file actions (protocol, metaData, txn) are a handful of
    * rows and always replay driver-side. Tunable for specs.
    */
  private[lake] var distributedReplayCheckpointBytes: Long = 16L << 20

  /** Rows per file a MERGE's insert set lands as: a bulk upsert writes
    * ceil(sourceRows / this) target-sized files in ONE job instead of
    * serializing 10⁹ rows through a single task; a point merge
    * (source ≤ one file) keeps the shuffle-free single-file path.
    * Test seam, like [[distributedReplayCheckpointBytes]].
    */
  private[lake] var mergeInsertRowsPerFile: Long = 4L << 20

  /** Largest source-key set a MERGE enumerates driver-side for the
    * footer-bloom point prune ([[mergeCandidates]] layer 2) — above
    * it, bulk merges rely on range pruning + the semi-join probe
    * (where most files genuinely hold matches anyway). Test seam.
    */
  private[lake] var mergeBloomMaxKeys: Long = 1024L

  /** Distributed last-action-wins reconstruction of the ACTIVE add set
    * at `version` — the 100 TB-posture replacement for driver-side
    * HashMap replay: at millions of files the checkpoint is itself big
    * data, so the checkpoint parquet and the JSON tail are unioned as
    * DataFrames, the newest action per path wins via one window, and
    * only rows whose final action is `add` survive. Output columns:
    * (version, path, pv, size, mod, stats) — `path` DECODED, one row
    * per active file. The driver then holds active-file-count rows (the
    * planning surface it needs anyway), never action-count rows.
    * Equality with the driver-side fold is spec-pinned.
    */
  def activeAddsDF(spark: SparkSession, root: String,
                   version: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val fromCp = checkpointRefs(root).filter(_.version <= version).lastOption
    val replayFrom = fromCp.map(_.version + 1).getOrElse(0L)
    val present = versions(root).toSet
    (replayFrom to version).foreach(v => require(present.contains(v),
      s"DeltaLog: commit $v missing from $root (newest usable checkpoint: " +
        s"${fromCp.map(_.version).getOrElse(-1L)})"))
    val cpAdds: org.apache.spark.sql.Dataset[ActRow] = fromCp match {
      case Some(ref) =>
        val cpv = ref.version
        checkpointActionsDF(spark, root, ref)
          .where(col("add.path").isNotNull)
          .select(col("add.path"), col("add.partitionValues"),
            col("add.size"), col("add.modificationTime"), col("add.stats"),
            org.apache.spark.sql.functions.to_json(col("add.deletionVector"))
              .as("dv"))
          .as[(String, Map[String, String], Option[Long], Option[Long],
            Option[String], Option[String])]
          .map { case (p, pv, sz, md, st, dv) =>
            ActRow(cpv, isAdd = true, decodePath(p),
              Option(pv).getOrElse(Map.empty), sz, md, st, dv)
          }
      case None => spark.emptyDataset[ActRow]
    }
    val tailVersions = (replayFrom to version)
    val tailActs: org.apache.spark.sql.Dataset[ActRow] =
      if (tailVersions.isEmpty) spark.emptyDataset[ActRow]
      else spark.read
        .textFile(tailVersions.map(v =>
          logDir(root).resolve(commitName(v)).toString): _*)
        .select(regexp_extract(input_file_name(),
          "(\\d{20})\\.json", 1).cast("long").as("v"), col("value"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val m = new ObjectMapper()
          it.flatMap { case (v, line) =>
            if (line.trim.isEmpty) Iterator.empty
            else {
              val node = m.readTree(line)
              if (node.has("add")) {
                val a = node.get("add")
                val pvNode = a.path("partitionValues")
                val pv =
                  if (pvNode.isObject)
                    pvNode.properties().asScala
                      .map(e => e.getKey ->
                        (if (e.getValue.isNull) null else e.getValue.asText()))
                      .toMap
                  else Map.empty[String, String]
                Iterator.single(ActRow(v, isAdd = true,
                  decodePath(a.path("path").asText()), pv,
                  if (a.path("size").isNumber) Some(a.path("size").asLong())
                  else None,
                  if (a.path("modificationTime").isNumber)
                    Some(a.path("modificationTime").asLong())
                  else None,
                  if (a.path("stats").isTextual)
                    Some(a.path("stats").asText())
                  else None,
                  if (a.path("deletionVector").isObject)
                    Some(m.writeValueAsString(a.path("deletionVector")))
                  else None))
              } else if (node.has("remove")) {
                Iterator.single(ActRow(v, isAdd = false,
                  decodePath(node.get("remove").path("path").asText()),
                  Map.empty, None, None, None, None))
              } else Iterator.empty
            }
          }
        }
    // newest action per path wins; within ONE version the add beats the
    // remove — DV deletes and RESTORE legitimately commit remove+add of
    // the SAME path in one commit (retire the old entry, re-add with
    // the DV/restored state), and the driver-side fold applies the add
    // after the remove, so the distributed fold must agree or those
    // files silently vanish from the active set
    val w = Window.partitionBy(col("path"))
      .orderBy(col("version").desc, col("isAdd").desc)
    cpAdds.union(tailActs).toDF()
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("isAdd"))
      .select(col("version"), col("path"), col("pv"), col("size"),
        col("mod"), col("stats"), col("dv"))
  }

  private def replay(spark: SparkSession, root: String,
                     upTo: Long): LogState = {
    val present = versions(root)
    val fromCp = checkpointRefs(root).filter(_.version <= upTo).lastOption
    require(present.contains(upTo) || fromCp.exists(_.version == upTo),
      s"DeltaLog: version $upTo of $root does not exist " +
        s"(have ${present.mkString(",")})")
    var schema: Option[StructType] = None
    var partitionCols: Seq[String] = Seq.empty
    var minReader = 1
    var minWriter = 2
    var readerFeats: Seq[String] = Seq.empty
    var writerFeats: Seq[String] = Seq.empty
    var config: Map[String, String] = Map.empty
    var tableId: String = null
    val active = new java.util.LinkedHashMap[String, Map[String, String]]()
    val sizes = scala.collection.mutable.Map.empty[String, Long]
    val mods = scala.collection.mutable.Map.empty[String, Long]
    val statsOf = scala.collection.mutable.Map.empty[String, String]
    val dvs = scala.collection.mutable.Map.empty[String, DvDescriptor]
    val txns = scala.collection.mutable.Map.empty[String, Long]

    def applyMeta(id: String, ss: String, pcs: Seq[String],
                  cfg: Map[String, String]): Unit = {
      if (id != null) tableId = id
      partitionCols = pcs
      config = cfg
      if (ss != null)
        schema = Some(DataType.fromJson(ss).asInstanceOf[StructType])
    }

    // Big checkpoint ⇒ file state is reconstructed DISTRIBUTED (one
    // window job, driver holds only the active set); the handful of
    // protocol/metaData/txn actions always replay driver-side. V2
    // checkpoints count the top file plus the whole sidecar dir (an
    // over-count across checkpoints only flips INTO the distributed
    // mode, which is always correct).
    val distributed = fromCp.exists {
      case ClassicCp(_, files) =>
        files.map(Files.size(_)).sum > distributedReplayCheckpointBytes
      case V2Cp(_, top) =>
        val sideDir = logDir(root).resolve("_sidecars")
        val sideBytes =
          if (!Files.isDirectory(sideDir)) 0L
          else {
            val s = Files.list(sideDir)
            try s.iterator().asScala
              .filter(Files.isRegularFile(_)).map(Files.size(_)).sum
            finally s.close()
          }
        Files.size(top) + sideBytes > distributedReplayCheckpointBytes
    }

    val replayFrom: Long = fromCp match {
      case Some(ref) =>
        val cpv = ref.version
        // Checkpoint = full state at cpv: protocol + metaData + active
        // adds (tombstone removes, if present, are irrelevant to reads).
        val reader = checkpointActionsDF(spark, root, ref)
        val rows = (if (distributed) reader.where(col("add").isNull)
                    else reader).collect()
        rows.foreach { r =>
          if (!r.isNullAt(4)) {
            val p = r.getStruct(4)
            minReader = p.getInt(0); minWriter = p.getInt(1)
            readerFeats =
              if (p.length > 2 && !p.isNullAt(2)) p.getSeq[String](2).toSeq
              else Seq.empty
            writerFeats =
              if (p.length > 3 && !p.isNullAt(3)) p.getSeq[String](3).toSeq
              else Seq.empty
          } else if (!r.isNullAt(3)) {
            val m = r.getStruct(3)
            val provider = m.getStruct(3).getString(0)
            require(provider == "parquet",
              s"DeltaLog: format provider '$provider' unsupported")
            applyMeta(m.getString(0), m.getString(4),
              Option(m.getSeq[String](5)).map(_.toSeq).getOrElse(Seq.empty),
              Option(m.getMap[String, String](6)).map(_.toMap)
                .getOrElse(Map.empty))
          } else if (!r.isNullAt(1)) {
            val a = r.getStruct(1)
            val path = decodePath(a.getString(0))
            val pv = Option(a.getMap[String, String](1))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            active.put(path, pv)
            if (!a.isNullAt(2)) sizes(path) = a.getLong(2)
            if (!a.isNullAt(3)) mods(path) = a.getLong(3)
            if (!a.isNullAt(5)) statsOf(path) = a.getString(5)
            if (a.length > 7 && !a.isNullAt(7)) {
              val d = a.getStruct(7)
              dvs(path) = DvDescriptor(d.getString(0), d.getString(1),
                if (d.isNullAt(2)) None else Some(d.getLong(2)),
                d.getInt(3), d.getLong(4))
            } else dvs.remove(path)
          } else if (!r.isNullAt(0)) {
            val t = r.getStruct(0)
            if (!t.isNullAt(0) && !t.isNullAt(1))
              txns(t.getString(0)) =
                math.max(txns.getOrElse(t.getString(0), Long.MinValue),
                  t.getLong(1))
          }
          // remove tombstones: not state for reads
        }
        cpv + 1
      case None => 0L
    }
    // The JSON tail must be contiguous from the replay start — a gap
    // below the newest checkpoint is fine (that's what the checkpoint
    // is FOR); a gap above it means missing history.
    (replayFrom to upTo).foreach(v => require(present.contains(v),
      s"DeltaLog: commit $v missing from $root (newest usable checkpoint: " +
        s"${fromCp.map(_.version).getOrElse(-1L)})"))
    (replayFrom to upTo).foreach { v =>
      val lines = Files.readAllLines(logDir(root).resolve(commitName(v)))
        .asScala.filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("protocol")) {
          val p = node.get("protocol")
          minReader = p.path("minReaderVersion").asInt(1)
          minWriter = p.path("minWriterVersion").asInt(2)
          val rf = p.path("readerFeatures")
          readerFeats =
            if (rf.isArray) rf.elements().asScala.map(_.asText()).toSeq
            else Seq.empty
          val wf = p.path("writerFeatures")
          writerFeats =
            if (wf.isArray) wf.elements().asScala.map(_.asText()).toSeq
            else Seq.empty
        } else if (node.has("metaData")) {
          val md = node.get("metaData")
          val provider = md.path("format").path("provider").asText("parquet")
          require(provider == "parquet",
            s"DeltaLog: format provider '$provider' unsupported")
          val pc = md.path("partitionColumns")
          val pcs =
            if (pc.isArray) pc.elements().asScala.map(_.asText()).toSeq
            else Seq.empty
          val cfgNode = md.path("configuration")
          val cfg =
            if (cfgNode.isObject)
              cfgNode.properties().asScala
                .map(e => e.getKey -> e.getValue.asText(null)).toMap
            else Map.empty[String, String]
          applyMeta(md.path("id").asText(null),
            md.path("schemaString").asText(null), pcs, cfg)
        } else if (node.has("add")) {
          if (!distributed) {
            val a = node.get("add")
            val path = decodePath(a.path("path").asText())
            val pvNode = a.path("partitionValues")
            val pv =
              if (pvNode.isObject)
                pvNode.properties().asScala
                  .map(e => e.getKey ->
                    (if (e.getValue.isNull) null else e.getValue.asText()))
                  .toMap
              else Map.empty[String, String]
            active.put(path, pv)
            if (a.path("size").isNumber) sizes(path) = a.path("size").asLong()
            if (a.path("modificationTime").isNumber)
              mods(path) = a.path("modificationTime").asLong()
            if (a.path("stats").isTextual) statsOf(path) = a.path("stats").asText()
            dvFromNode(a.path("deletionVector")) match {
              case Some(d) => dvs(path) = d
              case None => dvs.remove(path) // re-add without DV clears it
            }
          }
        } else if (node.has("remove")) {
          if (!distributed) {
            val p = decodePath(node.get("remove").path("path").asText())
            active.remove(p)
            dvs.remove(p)
          }
        } else if (node.has("txn")) {
          val t = node.get("txn")
          val app = t.path("appId").asText(null)
          if (app != null && t.path("version").isNumber)
            txns(app) = math.max(txns.getOrElse(app, Long.MinValue),
              t.path("version").asLong())
        }
        // commitInfo / cdc / domainMetadata: ignored by design
      }
    }
    if (distributed) {
      // file state wholesale from the distributed reconstruction —
      // ordered (version, path) for deterministic assembly
      activeAddsDF(spark, root, upTo)
        .orderBy(col("version"), col("path"))
        .collect().foreach { r =>
          val path = r.getString(1)
          active.put(path,
            Option(r.getMap[String, String](2)).map(_.toMap)
              .getOrElse(Map.empty))
          if (!r.isNullAt(3)) sizes(path) = r.getLong(3)
          if (!r.isNullAt(4)) mods(path) = r.getLong(4)
          if (!r.isNullAt(5)) statsOf(path) = r.getString(5)
          if (!r.isNullAt(6))
            dvFromNode(mapper.readTree(r.getString(6)))
              .foreach(dvs(path) = _)
        }
    }
    val st = LogState(schema, partitionCols, minReader, minWriter,
      readerFeats, writerFeats, config, tableId,
      active.entrySet().iterator().asScala
        .map(e => e.getKey -> e.getValue).toSeq,
      sizes.toMap, mods.toMap, statsOf.toMap, dvs.toMap, txns.toMap)
    validateReaderSupport(root, st)
    st
  }

  /** Delta `path` fields are URL-encoded (PROTOCOL.md) and either
    * RELATIVE to the table root or ABSOLUTE (shallow clones reference
    * their source's files absolutely); `file:` URIs decode to local
    * absolute paths, any other scheme refuses loudly (local
    * filesystems only here).
    */
  private def decodePath(raw: String): String =
    try {
      val u = new java.net.URI(raw)
      u.getScheme match {
        case null => u.getPath
        case "file" => u.getPath
        case other => throw new IllegalArgumentException(
          s"DeltaLog: path scheme '$other' unsupported ('$raw' — " +
            "local files only)")
      }
    } catch { case _: java.net.URISyntaxException => raw }

  /** Resolve an action path against the table root — identity for the
    * absolute paths shallow-cloned logs carry.
    */
  private def resolvePath(root: String, rel: String): Path =
    if (rel.startsWith("/")) Paths.get(rel) else Paths.get(root, rel)

  /** Staging directory UNDER the table root (created on demand): the
    * final rename of a staged file into the table or its `_delta_log` is
    * then guaranteed same-filesystem — staging in `java.io.tmpdir`
    * (commonly tmpfs) made every `ATOMIC_MOVE` throw
    * `AtomicMoveNotSupportedException` whenever /tmp and the table lived
    * on different filesystems. The dot-prefixed name keeps Spark's file
    * listing (and therefore every reader) blind to it.
    */
  private def stagingBase(root: String): Path =
    Files.createDirectories(Paths.get(root, ".graft_staging"))

  private def deleteRecursively(dir: Path): Unit = {
    val walk = Files.walk(dir)
    val all = try walk.iterator().asScala.toSeq finally walk.close()
    all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists)
  }

  /** Write `df` as ONE parquet file staged UNDER `root` (see
    * [[stagingBase]]); returns the part-file path, hoisted out of the
    * Spark output dir (whose `_SUCCESS`/checksum noise is deleted) —
    * callers rename it to its final home, same-filesystem by
    * construction. Callers that decide NOT to keep the file must
    * `Files.delete` it.
    */
  private def writeSingleParquet(df: DataFrame, root: String,
                                 prefix: String,
                                 writeOptions: Map[String, String] =
                                   Map.empty): Path = {
    val staging = Files.createTempDirectory(stagingBase(root), prefix)
    df.coalesce(1).write.options(writeOptions).mode("overwrite")
      .parquet(staging.toString)
    val s = Files.list(staging)
    val part =
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"DeltaLog: no parquet produced in $staging"))
      finally s.close()
    val hoisted = stagingBase(root).resolve(part.getFileName)
    Files.move(part, hoisted, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(staging)
    hoisted
  }

  /** Write `df` as `numFiles` parquet files staged UNDER `root` in ONE
    * Spark job (round-robin repartition — the [[Layout.compact]]
    * rows-per-file discipline); returns the hoisted part files. The
    * multi-file sibling of [[writeSingleParquet]] for bulk writes that
    * must not serialize through one task.
    */
  private def writeParquetFiles(df: DataFrame, root: String,
                                prefix: String, numFiles: Int,
                                writeOptions: Map[String, String] =
                                  Map.empty): Seq[Path] = {
    require(numFiles >= 1, s"DeltaLog.writeParquetFiles: numFiles >= 1")
    val staging = Files.createTempDirectory(stagingBase(root), prefix)
    df.repartition(numFiles).write.options(writeOptions).mode("overwrite")
      .parquet(staging.toString)
    val s = Files.list(staging)
    val parts =
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    require(parts.nonEmpty, s"DeltaLog: no parquet produced in $staging")
    val hoisted = parts.map { part =>
      val h = stagingBase(root).resolve(part.getFileName)
      Files.move(part, h, StandardCopyOption.ATOMIC_MOVE)
      h
    }
    deleteRecursively(staging)
    hoisted
  }

  /** Typed aggregator building the serialized PORTABLE roaring bitmap
    * from row positions — executor-side DV construction: partial
    * bitmaps merge map-side, the driver receives bitmap BYTES per
    * file, never row positions (driver memory ∝ bitmap size, not
    * deleted-row count). Java serialization for the buffer: bitmaps
    * are Externalizable and the shuffled state is bitmap-sized.
    */
  private[lake] object BitmapAgg
    extends org.apache.spark.sql.expressions.Aggregator[
      Long, Dv.PositionSetBuilder, Array[Byte]] {
    def zero: Dv.PositionSetBuilder = new Dv.PositionSetBuilder
    def reduce(b: Dv.PositionSetBuilder, pos: Long): Dv.PositionSetBuilder =
      b.add(pos)
    def merge(a: Dv.PositionSetBuilder,
              b: Dv.PositionSetBuilder): Dv.PositionSetBuilder = a.merge(b)
    def finish(b: Dv.PositionSetBuilder): Array[Byte] =
      Dv.serialize(b.result())
    def bufferEncoder: org.apache.spark.sql.Encoder[Dv.PositionSetBuilder] =
      org.apache.spark.sql.Encoders.javaSerialization[Dv.PositionSetBuilder]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Tag column the batched rewrite/probe machinery keys on — the
    * table-relative path or basename when collision-free
    * ([[chooseTagging]]), else a synthesized md5(file_path)
    * ([[synthesizedTagging]]): every layout runs the batched one-job
    * plans.
    */
  private val SrcTagCol = "__graft_src"

  /** File-tagging strategy for the batched multi-file machinery: how
    * the executor labels each row's source file (`tagExpr` over the
    * scan's `_metadata`) and how the driver predicts that label for a
    * known rel (`tagOf`).
    */
  private case class FileTagging(
      tagExpr: org.apache.spark.sql.Column,
      tagOf: String => String)

  /** Choose a COLLISION-FREE tagging for `rels`: the table-relative
    * path (last depth+1 segments of `_metadata.file_path`) when depths
    * are uniform and characters URI-round-trip-safe — partitioned
    * layouts REPEAT part basenames across partition directories (one
    * write, one part numbering), so basenames alone cannot tag them —
    * else the basename when unique, else None (callers synthesize a
    * tag via [[synthesizedTagging]]).
    */
  /** GUARANTEED-unique tagging for layouts where no structural
    * collision-free tag exists (imported/CONVERTed tables with
    * duplicate basenames across MIXED depths, URI-unsafe characters,
    * clone-absolute refs): ONE metadata-only probe job enumerates each
    * file's actual `_metadata.file_path` rendering, and the tag is
    * md5(file_path) — computed executor-side by the codegen'd `md5`
    * expression and driver-side from the collected rendering per rel.
    * Hex tags are partition-directory-safe by construction, so hostile
    * layouts STAY on the one-probe + one-rewrite batched path instead
    * of degrading to per-file jobs. Driver state is one string per
    * candidate file — the manifests' class.
    */
  private def synthesizedTagging(spark: SparkSession, root: String,
      rels: Seq[String]): FileTagging = {
    import org.apache.spark.sql.functions.md5
    val paths = rels.map(r => resolvePath(root, r).toString)
    val rendered = spark.read.schema(StructType(Nil))
      .parquet(paths: _*)
      .select(col("_metadata.file_path"))
      .distinct().collect().map(_.getString(0)).toSeq
    // map each rendering back to its rel through the SAME class that
    // produced it (Hadoop Path round-trips its own toString; a raw
    // java.net.URI parse would choke on spaces)
    val byAbs: Map[String, String] = rels.map { r =>
      resolvePath(root, r).toAbsolutePath.normalize().toString -> r
    }.toMap
    val relToRendered: Map[String, String] = rendered.map { s =>
      val abs = Paths.get(new org.apache.hadoop.fs.Path(s).toUri.getPath)
        .toAbsolutePath.normalize().toString
      byAbs.getOrElse(abs, throw new IllegalStateException(
        s"DeltaLog: file_path rendering $s matches no candidate file")) -> s
    }.toMap
    // a ZERO-ROW parquet file yields no probe row: no scanned row will
    // ever carry its tag (it holds no matching rows by construction), so
    // any deterministic rendering works — use the same Hadoop Path class
    // the probe renders through, instead of aborting the whole DML
    val full: Map[String, String] = rels.distinct.map { r =>
      r -> relToRendered.getOrElse(r,
        new org.apache.hadoop.fs.Path(
          resolvePath(root, r).toString).toString)
    }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    FileTagging(md5(col("_metadata.file_path")),
      rel => md5hex(full(rel)))
  }

  private def chooseTagging(root: String,
      rels: Seq[String]): Option[FileTagging] = {
    import org.apache.spark.sql.functions.{array_join, slice, split}
    val safe = rels.forall(r => !r.startsWith("/") &&
      r.forall(c => c.isLetterOrDigit || "._-=/".indexOf(c.toInt) >= 0))
    val depths = rels.map(_.count(_ == '/')).distinct
    if (safe && depths.size == 1) {
      val n = depths.head + 1
      Some(FileTagging(
        array_join(slice(split(col("_metadata.file_path"), "/"),
          -n, n), "/"),
        identity))
    } else {
      val byName = rels.map(rel =>
        resolvePath(root, rel).getFileName.toString)
      if (byName.distinct.size == byName.size)
        Some(FileTagging(col("_metadata.file_name"),
          rel => resolvePath(root, rel).getFileName.toString))
      else None
    }
  }

  /** (basename, position) rows of the given files' deletion vectors —
    * positions exploded EXECUTOR-side from the shipped bitmap bytes
    * (the [[dvFilteredFiles]] idiom), broadcast when the total
    * cardinality is join-build sized. The anti-join key for every
    * "live rows only" multi-file scan below.
    */
  private def dvPositionsByName(spark: SparkSession, root: String,
      dvs: Map[String, DvDescriptor],
      tagOf: String => String = null): DataFrame = {
    import spark.implicits._
    val tag: String => String =
      if (tagOf != null) tagOf
      else rel => resolvePath(root, rel).getFileName.toString
    val rows: Seq[(String, Array[Byte])] = dvs.toSeq.map { case (rel, d) =>
      tag(rel) -> d.readBytes(root) }
    val df = spark.createDataset(rows)
      .flatMap { case (n, b) => Dv.deserialize(b).positions.map(p => (n, p)) }
      .toDF(SrcTagCol, "__graft_pos")
    // broadcast bound is on BUILD BYTES, not row count: relative-path
    // tags run tens of bytes each, so 4M rows could be a several-hundred
    // -MB hash build — estimate per-row cost (tag chars + boxed long +
    // map-entry overhead) and stay under a safe build size
    val estBytes = dvs.toSeq.map { case (rel, d) =>
      d.cardinality * (tag(rel).length + 64L) }.sum
    if (estBytes <= (64L << 20))
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }

  /** Read `files` in LOGICAL space EXCLUDING each file's DV-deleted
    * positions — the live-row multi-file scan the CDC builders use
    * (mapping-aware: scans resolve physical names / field ids and hand
    * back logical columns). Always ONE scan: hostile layouts tag via
    * [[synthesizedTagging]].
    */
  private def readFilesMinusDv(spark: SparkSession, root: String,
      st: LogState, dataSchema: StructType,
      files: Seq[String]): DataFrame = {
    val (scanSchema, physMap) = readSchemaFor(st, dataSchema)
    def toLogical = dataSchema.fields.map(f =>
      toLogicalField(f, physMap.getOrElse(f.name, f.name)))
    val dvs = files.flatMap(rel => st.fileDvs.get(rel).map(rel -> _)).toMap
    val paths = files.map(f => resolvePath(root, f).toString)
    if (dvs.isEmpty)
      spark.read.schema(scanSchema).parquet(paths: _*)
        .select(toLogical.toIndexedSeq: _*)
    else {
      val tagging = chooseTagging(root, files)
        .getOrElse(synthesizedTagging(spark, root, files))
      spark.read.schema(scanSchema).parquet(paths: _*)
        .select(toLogical :+
          tagging.tagExpr.as(SrcTagCol) :+
          col("_metadata.row_index").as("__graft_pos"): _*)
        .join(dvPositionsByName(spark, root, dvs, tagging.tagOf),
          Seq(SrcTagCol, "__graft_pos"), "left_anti")
        .drop(SrcTagCol, "__graft_pos")
    }
  }

  /** Exact TOUCHED subset of `candidates`: ONE column-pruned,
    * predicate-pushable scan over all candidate files at once, tagged
    * by basename via `_metadata.file_name`. `matcher` narrows the
    * scanned rows to the matched ones (a filter, or a semi-join against
    * source keys) and must preserve the [[SrcTagCol]] column. Candidate
    * order is preserved in the result. This replaces per-file limit-1
    * probe jobs: at 10 k candidate files the probe is one job, not 10 k.
    */
  private def probeTouched(spark: SparkSession, root: String,
      candidates: Seq[(String, Map[String, String])],
      probeSchema: StructType, matcher: DataFrame => DataFrame,
      st: LogState,
      dvs: Map[String, DvDescriptor] = Map.empty)
    : Seq[(String, Map[String, String])] = {
    import spark.implicits._
    if (candidates.isEmpty) return Nil
    // column mapping: scan PHYSICAL field names / field ids, hand the
    // matcher LOGICAL ones (identity when unmapped)
    val (physSchema, physMap) = readSchemaFor(st, probeSchema)
    def logicalCols = probeSchema.fields.map(f =>
      toLogicalField(f, physMap.getOrElse(f.name, f.name)))
    // hostile layouts (duplicate basenames at mixed depths, unsafe
    // chars) get a synthesized md5(file_path) tag from one metadata
    // probe job — the fast path never degrades to per-file plans
    val tagging = chooseTagging(root, candidates.map(_._1))
      .getOrElse(synthesizedTagging(spark, root, candidates.map(_._1)))
    val tagToRel = candidates.map(c => tagging.tagOf(c._1) -> c._1).toMap
    // DV-carrying candidates probe over their LIVE rows only — a
    // file whose matching rows are all already DV-deleted is NOT
    // touched (rewriting it would commit a dataChange no-op).
    // row_index must ride the SCAN's own select (_metadata is
    // unreachable after any projection).
    val scan0 = spark.read.schema(physSchema)
      .parquet(candidates.map(c => resolvePath(root, c._1).toString): _*)
    val live =
      if (dvs.isEmpty)
        scan0.select(logicalCols :+ tagging.tagExpr.as(SrcTagCol): _*)
      else
        scan0.select(logicalCols :+ tagging.tagExpr.as(SrcTagCol) :+
          col("_metadata.row_index").as("__graft_pos"): _*)
          .join(dvPositionsByName(spark, root, dvs, tagging.tagOf),
            Seq(SrcTagCol, "__graft_pos"), "left_anti")
          .drop("__graft_pos")
    val hit: Set[String] = matcher(live)
      .select(col(SrcTagCol)).distinct()
      .as[String].collect().toSet.map(tagToRel)
    candidates.filter { case (rel, _) => hit(rel) }
  }

  /** Rewrite `rels` in ONE Spark job: a single multi-file scan tagged
    * by source basename, `transform` applied (it sees the data columns
    * plus [[SrcTagCol]] and must carry the tag through — filters,
    * withColumn folds and join-based row drops all do), then ONE
    * dynamic-partitioned write producing exactly one staged file per
    * touched input (hash repartition on the tag lands every source
    * file's rows in one task). Returns rel → staged part file; a rel
    * whose rewrite kept ZERO rows is absent (its partition directory is
    * never created). This is the scale posture for wide DML: a DELETE
    * touching 10 k files runs one probe job and one rewrite job, never
    * 10 k sequential single-task jobs.
    */
  private def rewriteFilesBatched(spark: SparkSession, root: String,
      rels: Seq[String], dataSchema: StructType,
      transform: DataFrame => DataFrame,
      prefix: String,
      st: LogState,
      dvs: Map[String, DvDescriptor] = Map.empty,
      writeOptions: Map[String, String] = Map.empty): Map[String, Path] = {
    if (rels.isEmpty) return Map.empty
    // column mapping: files are scanned AND rewritten under PHYSICAL
    // names / field ids; the transform runs between two renames in
    // LOGICAL space. DV-carrying inputs rewrite their LIVE rows only
    // (positions anti-joined executor-side) — the rewrite CLEARS the DV.
    val (physSchema, physMap) = readSchemaFor(st, dataSchema)
    val fieldIds = physFieldIds(st, dataSchema)
    def toLogical = dataSchema.fields.map(f =>
      toLogicalField(f, physMap.getOrElse(f.name, f.name)))
    def toPhysical = dataSchema.fields.map(f =>
      toPhysicalField(mappingMode(st) == "id", f,
        physMap.getOrElse(f.name, f.name)))
    // hostile layouts stay on the ONE-job batched path via the
    // synthesized md5(file_path) tag (hex — partition-dir-safe)
    val tagging = chooseTagging(root, rels)
      .getOrElse(synthesizedTagging(spark, root, rels))
    val tagToRel = rels.map(rel => tagging.tagOf(rel) -> rel).toMap
    val staging = Files.createTempDirectory(stagingBase(root), prefix)
    val scan0 = spark.read.schema(physSchema)
      .parquet(rels.map(r => resolvePath(root, r).toString): _*)
    val scanned =
      if (dvs.isEmpty)
        scan0.select(toLogical :+ tagging.tagExpr.as(SrcTagCol): _*)
      else
        scan0.select(toLogical :+ tagging.tagExpr.as(SrcTagCol) :+
          col("_metadata.row_index").as("__graft_pos"): _*)
          .join(dvPositionsByName(spark, root, dvs, tagging.tagOf),
            Seq(SrcTagCol, "__graft_pos"), "left_anti")
          .drop("__graft_pos")
    stampFieldIds(transform(scanned)
      .select(toPhysical :+ col(SrcTagCol): _*), fieldIds)
      .repartition(rels.size, col(SrcTagCol))
      .write.options(writeOptions).partitionBy(SrcTagCol).mode("overwrite")
      .parquet(staging.toString)
    val out = Map.newBuilder[String, Path]
    val dirs = Files.list(staging)
    try dirs.iterator().asScala.filter(Files.isDirectory(_)).foreach { d =>
      val dn = d.getFileName.toString
      if (dn.startsWith(SrcTagCol + "=")) {
        val name = unescapeHive(dn.drop(SrcTagCol.length + 1))
        val s = Files.list(d)
        val part =
          try s.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(
              s"DeltaLog: no parquet produced for $name in $staging"))
          finally s.close()
        // one task writes several partition dirs under ONE part name —
        // hoist under a fresh UUID so sibling moves cannot collide
        val hoisted = stagingBase(root).resolve(
          s"part-00000-${java.util.UUID.randomUUID()}.snappy.parquet")
        Files.move(part, hoisted, StandardCopyOption.ATOMIC_MOVE)
        out += tagToRel(name) -> hoisted
      }
    } finally dirs.close()
    deleteRecursively(staging)
    out.result()
  }

  /** Canonical `add` action for an on-disk table file: size/mtime from
    * the filesystem, `stats` from the footer.
    */
  private def addActionNode(root: String, rel: String,
                            pv: Map[String, String], dataChange: Boolean,
                            conf: org.apache.hadoop.conf.Configuration,
                            dv: Option[DvDescriptor] = None): JsonNode = {
    val fp = resolvePath(root, rel)
    val n = mapper.createObjectNode()
    val a = n.putObject("add")
    a.put("path", encodePath(rel))
    val pvo = a.putObject("partitionValues")
    pv.foreach { case (k, sv) =>
      if (sv == null) pvo.putNull(k) else pvo.put(k, sv)
    }
    a.put("size", Files.size(fp))
    a.put("modificationTime", Files.getLastModifiedTime(fp).toMillis)
    a.put("dataChange", dataChange)
    a.put("stats", footerStatsJson(fp, conf))
    dv.foreach { d =>
      val o = a.putObject("deletionVector")
      o.put("storageType", d.storageType)
      o.put("pathOrInlineDv", d.pathOrInlineDv)
      d.offset.foreach(o.put("offset", _))
      o.put("sizeInBytes", d.sizeInBytes)
      o.put("cardinality", d.cardinality)
    }
    n
  }

  private def removeActionNode(rel: String, dataChange: Boolean): JsonNode = {
    val n = mapper.createObjectNode()
    val r = n.putObject("remove")
    r.put("path", encodePath(rel))
    r.put("deletionTimestamp", System.currentTimeMillis())
    r.put("dataChange", dataChange)
    n
  }

  // ------------------------------------------------------------------
  // Change data feed (PROTOCOL.md: Add CDC File; the `cdc` action)
  // ------------------------------------------------------------------

  /** The CDF row-kind column CDC files carry and [[readChangeFeed]]
    * returns: `insert`, `delete`, `update_preimage`, `update_postimage`.
    */
  val ChangeTypeCol = "_change_type"

  private def cdfEnabled(st: LogState): Boolean =
    st.configuration.get("delta.enableChangeDataFeed")
      .exists(_.trim.equalsIgnoreCase("true"))

  /** Writer features this implementation genuinely HONORS when
    * mutating a features-form (writer 7) table: the legacy set it
    * implements (appendOnly/invariants/checkConstraints/changeDataFeed/
    * generatedColumns/identityColumns), columnMapping (every write on a
    * mapped table refuses downstream anyway), deletionVectors,
    * v2Checkpoint, inCommitTimestamp, vacuumProtocolCheck and
    * timestampNtz. A table naming anything else (rowTracking,
    * domainMetadata, icebergCompat*, …) would be CORRUPTED by a writer
    * that ignores the feature's write obligations — so every mutating
    * entry point refuses, NAMING the feature, while reads stay open
    * (reader features are vetted separately).
    */
  private val honoredWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "changeDataFeed",
    "generatedColumns", "columnMapping", "identityColumns",
    "deletionVectors", "v2Checkpoint", "inCommitTimestamp",
    "vacuumProtocolCheck", "timestampNtz",
    // the feature's write obligation — record each change under
    // delta.typeChanges when altering a type — is honored by
    // [[widenColumnType]], the only type-altering entry point here;
    // ordinary writes land in the DECLARED (widened) type
    "typeWidening",
    // variant columns write through Spark's native parquet variant
    // encoding (metadata/value binary pair); no extra obligation
    "variantType")

  private def requireWritable(st: LogState, op: String): Unit = {
    val unknown = st.writerFeatures.filterNot(honoredWriterFeatures)
    require(unknown.isEmpty,
      s"DeltaLog.$op: table declares writer feature(s) " +
        s"${unknown.mkString(", ")} this writer does not implement — " +
        "writing would violate their obligations; table stays readable")
  }

  /** `delta.appendOnly=true` (PROTOCOL.md writer-version-2 feature):
    * an append-only table refuses every operation that DELETES or
    * CHANGES existing rows — any `remove` with `dataChange=true`.
    * Layout-only rewrites (OPTIMIZE / ZORDER: `dataChange=false`) and
    * pure appends stay legal. Called by every mutating entry point.
    */
  private def requireNotAppendOnly(st: LogState, op: String): Unit =
    require(!st.configuration.get("delta.appendOnly")
      .exists(_.trim.equalsIgnoreCase("true")),
      s"DeltaLog.$op: table is delta.appendOnly=true — it refuses " +
        "deletes and updates; only appends and layout-only OPTIMIZE " +
        "are legal")

  /** `cdc` action for an on-disk `_change_data/` file — same shape as
    * `add` minus stats; `dataChange` is ALWAYS false (PROTOCOL.md: CDC
    * files never affect snapshot state, only the change feed).
    */
  private def cdcActionNode(root: String, rel: String,
                            pv: Map[String, String]): JsonNode = {
    val n = mapper.createObjectNode()
    val c = n.putObject("cdc")
    c.put("path", encodePath(rel))
    val pvo = c.putObject("partitionValues")
    pv.foreach { case (k, sv) =>
      if (sv == null) pvo.putNull(k) else pvo.put(k, sv)
    }
    c.put("size", Files.size(Paths.get(root, rel)))
    c.put("dataChange", false)
    n
  }

  /** Stage `df` (data columns + [[ChangeTypeCol]]) as one CDC parquet
    * under `_change_data/` and return its `cdc` action carrying `pv`.
    */
  private def writeCdcFile(df: DataFrame, root: String,
                           pv: Map[String, String],
                           st: LogState): JsonNode = {
    // mapped tables: cdc files store PHYSICAL data-column names/ids at
    // every nesting level, like every other data file (the
    // `_change_type` column is a feed artifact, never mapped —
    // toPhysicalDf passes non-schema columns through)
    val out = st.schema.map(toPhysicalDf(st, _, df)).getOrElse(df)
    val part = writeSingleParquet(out, root, "graft-delta-cdc")
    val dir = Files.createDirectories(Paths.get(root, "_change_data"))
    val target = dir.resolve(
      "cdc-" + java.util.UUID.randomUUID() + ".parquet")
    Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
    val rel = Paths.get(root).relativize(target).toString
      .replace(java.io.File.separatorChar, '/')
    cdcActionNode(root, rel, pv)
  }

  /** Partitioned sibling of [[writeCdcFile]] — ONE dynamic-partitioned
    * job writes EVERY touched partition's cdc rows (`df` carries the
    * table's partition columns alongside data + `_change_type`), then
    * each staged part moves under `_change_data` with a pv-keyed cdc
    * action. The scale posture for partitioned DML change capture: cdc
    * jobs are O(1), never O(touched partitions).
    */
  private def writeCdcFilesPartitioned(df: DataFrame, root: String,
      pcs: Seq[String], st: LogState): Seq[JsonNode] = {
    require(pcs.nonEmpty, "writeCdcFilesPartitioned: partitioned only")
    val physMap = st.schema.map(physicalWriteMap(st, _))
      .getOrElse(Map.empty[String, String])
    val out = st.schema.map(toPhysicalDf(st, _, df)).getOrElse(df)
    val physPcs = pcs.map(c => physMap.getOrElse(c, c))
    val staging = Files.createTempDirectory(stagingBase(root),
      "graft-delta-cdc")
    out.repartition(physPcs.map(col): _*)
      .write.mode("overwrite").partitionBy(physPcs: _*)
      .parquet(staging.toString)
    val walk = Files.walk(staging)
    val parts =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.toString)
      finally walk.close()
    val dir = Files.createDirectories(Paths.get(root, "_change_data"))
    val nodes = parts.map { p =>
      val relStaged = staging.relativize(p).toString
        .replace(java.io.File.separatorChar, '/')
      val pv = partitionValuesOf(relStaged, physPcs)
      val target = dir.resolve(
        "cdc-" + java.util.UUID.randomUUID() + ".parquet")
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      val rel = Paths.get(root).relativize(target).toString
        .replace(java.io.File.separatorChar, '/')
      cdcActionNode(root, rel, pv)
    }
    deleteRecursively(staging)
    nodes
  }

  /** Writer features a LEGACY `minWriterVersion` implies — what a
    * protocol upgrade to version 7 must enumerate explicitly so
    * external feature-gated writers keep honoring them (PROTOCOL.md:
    * Writer Version Requirements).
    */
  private def legacyWriterFeatures(v: Int): Seq[String] =
    Seq(2 -> "appendOnly", 2 -> "invariants", 3 -> "checkConstraints",
      4 -> "changeDataFeed", 4 -> "generatedColumns", 5 -> "columnMapping",
      6 -> "identityColumns")
      .collect { case (floor, f) if floor <= v => f }

  /** Can `path`'s stats range intersect [lo, hi] on `column`? Missing
    * stats, or no numeric min/max for the column → conservatively true.
    */
  /** Mark `column` GENERATED ALWAYS AS (`genSql`) — Delta's generated
    * columns (PROTOCOL.md / delta.io: the `delta.generationExpression`
    * key in the StructField metadata of `schemaString`). Returns a
    * DataFrame whose schema carries the marker; committing it CREATES
    * the generated-column table (the declared schema is the contract
    * every later writer is held to, including external logs whose
    * schemaString carries the same key).
    */
  def withGenerationExpression(df: DataFrame, column: String,
                               genSql: String): DataFrame = {
    require(df.columns.contains(column),
      s"DeltaLog.withGenerationExpression: $column not in the DataFrame")
    val old = df.schema(column).metadata
    val meta = new MetadataBuilder().withMetadata(old)
      .putString("delta.generationExpression", genSql).build()
    df.withColumn(column, col(column).as(column, meta))
  }

  /** Identity columns declared in a schema (Delta's GENERATED … AS
    * IDENTITY: `delta.identity.start/step/allowExplicitInsert` plus the
    * writer-maintained `delta.identity.highWaterMark` in the field
    * metadata of `schemaString`).
    */
  private case class IdentityCol(name: String, start: Long, step: Long,
                                 allowExplicit: Boolean, hwm: Option[Long])

  private def identityInfo(schema: StructType): Seq[IdentityCol] =
    schema.fields.filter(_.metadata.contains("delta.identity.start"))
      .map { f =>
        val m = f.metadata
        IdentityCol(f.name, m.getLong("delta.identity.start"),
          m.getLong("delta.identity.step"),
          m.contains("delta.identity.allowExplicitInsert") &&
            m.getBoolean("delta.identity.allowExplicitInsert"),
          if (m.contains("delta.identity.highWaterMark"))
            Some(m.getLong("delta.identity.highWaterMark")) else None)
      }.toSeq

  /** `schema` with `col`'s `delta.identity.highWaterMark` set. */
  private def withHwm(schema: StructType, col: String,
                      hwm: Long): StructType =
    StructType(schema.fields.map { f =>
      if (f.name != col) f
      else f.copy(metadata = new MetadataBuilder()
        .withMetadata(f.metadata)
        .putLong("delta.identity.highWaterMark", hwm).build())
    })

  /** CREATE a table whose `idCol` is GENERATED ALWAYS AS IDENTITY
    * (START WITH `start` STEP `step`, PROTOCOL.md legacy writer
    * version 6): the creation batch gets ids assigned distributed —
    * `start + step·(partition-block offset)` via
    * monotonically_increasing_id, so assignment is one pass with NO
    * global sort or driver round-trip; ids are unique and
    * step-aligned but may have GAPS, exactly Delta's documented
    * identity semantics. The committed metaData records the
    * high-water mark (read back from the written files' FOOTER stats —
    * zero extra pass), and every later [[commitFlat]] batch that lacks
    * the column continues above it; batches providing explicit values
    * refuse unless `allowExplicitInsert`.
    */
  def createIdentityTable(spark: SparkSession, root: String,
                          df: DataFrame, idCol: String,
                          start: Long = 1L, step: Long = 1L,
                          allowExplicitInsert: Boolean = false,
                          configuration: Map[String, String] = Map.empty): Long = {
    require(step > 0, s"DeltaLog.createIdentityTable: step > 0 (got " +
      s"$step — descending identities are out of scope, documented)")
    require(!df.columns.contains(idCol),
      s"DeltaLog.createIdentityTable: $idCol already exists in the batch")
    val meta = new MetadataBuilder()
      .putLong("delta.identity.start", start)
      .putLong("delta.identity.step", step)
      .putBoolean("delta.identity.allowExplicitInsert", allowExplicitInsert)
      .build()
    val seeded = df.select(df.columns.map(col).toSeq :+
      (lit(start) + lit(step) *
        org.apache.spark.sql.functions.monotonically_increasing_id())
        .cast(LongType).as(idCol, meta): _*)
    commitFlat(spark, root, seeded, configuration = configuration)
  }

  /** (column, generation sql) pairs declared in a schema. */
  private def generationExprs(schema: StructType): Seq[(String, String)] =
    schema.fields
      .filter(_.metadata.contains("delta.generationExpression"))
      .map(f => f.name ->
        f.metadata.getString("delta.generationExpression")).toSeq

  /** Delta's generated-column write semantics: a batch LACKING the
    * column gets it COMPUTED from its expression; a batch PROVIDING it
    * is verified inline (`assert_true` riding the write — the same
    * zero-extra-pass shape as [[enforceInvariants]]): a provided value
    * that disagrees with GENERATED ALWAYS AS fails the write loudly.
    * Restores the declared column order when the computed columns
    * complete the schema.
    */
  private def applyGeneratedColumns(df: DataFrame,
                                    schema: StructType): DataFrame = {
    val gens = generationExprs(schema)
    if (gens.isEmpty) return df
    val applied = gens.foldLeft(df) { case (d, (c, g)) =>
      val e = expr(g).cast(schema(c).dataType)
      if (!d.columns.contains(c)) d.withColumn(c, e)
      else d.filter(assert_true(col(c) <=> e,
        lit(s"generated column $c does not match GENERATED ALWAYS AS " +
          s"($g)")).isNull)
    }
    if (schema.fieldNames.toSet == applied.columns.toSet)
      applied.select(schema.fieldNames.map(col).toSeq: _*)
    else applied
  }

  /** CHECK constraints recorded in the table configuration
    * (PROTOCOL.md / Delta's `ALTER TABLE ADD CONSTRAINT`:
    * `delta.constraints.<name> = <sql>`), name-sorted.
    */
  private def constraintsOf(cfg: Map[String, String]): Seq[(String, String)] =
    cfg.collect { case (k, v) if k.startsWith("delta.constraints.") =>
      k.stripPrefix("delta.constraints.") -> v }.toSeq.sortBy(_._1)

  /** Wrap a batch with INLINE writer invariants — NOT NULL for every
    * non-nullable declared column and every `delta.constraints.*`
    * CHECK expression. Enforcement rides the write itself (an
    * `assert_true` inside a filter — no second pass over the data, the
    * shape of Delta's own CheckDeltaInvariant node): the first
    * violating row fails the write loudly before any commit lands.
    * A CHECK must evaluate to TRUE — NULL counts as a violation
    * (write `… OR x IS NULL` when nulls are legal). Declared columns
    * the batch lacks are evaluated as typed NULLs, so a NOT NULL
    * column missing from a mergeSchema batch still refuses.
    */
  private def enforceInvariants(df: DataFrame, schema: StructType,
                                cfg: Map[String, String]): DataFrame = {
    val notNull = schema.fields.filter(!_.nullable)
      .map(f => (s"NOT NULL constraint violated: column ${f.name}",
        col(f.name).isNotNull))
    val checks = constraintsOf(cfg).map { case (n, sql) =>
      (s"CHECK constraint $n ($sql) violated",
        expr(sql).cast("boolean") <=> lit(true))
    }
    if (notNull.isEmpty && checks.isEmpty) return df
    val missing = schema.fields.filterNot(f => df.columns.contains(f.name))
    val widened = missing.foldLeft(df)((d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType)))
    val checked = (notNull ++ checks).foldLeft(widened) {
      case (d, (msg, cond)) =>
        d.filter(assert_true(cond, lit(msg)).isNull)
    }
    checked.select(df.columns.map(col).toSeq: _*)
  }

  /** `ALTER TABLE ADD CONSTRAINT name CHECK (sql)`: validates every
    * EXISTING row first (one scan — Delta's own semantics: adding a
    * constraint a current row violates fails), then commits a
    * metaData re-emit carrying `delta.constraints.name` plus the
    * protocol floor CHECK enforcement requires (legacy writer
    * version 3, or the `checkConstraints` writer feature on a
    * features table). Every later write through this bridge enforces
    * it inline. Returns the new version.
    */
  def addCheckConstraint(spark: SparkSession, root: String, name: String,
                         sql: String): Long = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"DeltaLog.addCheckConstraint: constraint name '$name' must be " +
        "alphanumeric/_")
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    // constraint SQL references LOGICAL names; validation reads via
    // readAt (mapped-aware) and enforcement runs in logical space —
    // all three mapping modes (none, name, id) work
    requireWritableMapping(st, "addCheckConstraint")
    require(!st.configuration.contains(s"delta.constraints.$name"),
      s"DeltaLog.addCheckConstraint: constraint $name already exists")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val violating = readAt(spark, root, v)
      .filter(!(expr(sql).cast("boolean") <=> lit(true)))
    require(violating.isEmpty,
      s"DeltaLog.addCheckConstraint: existing rows violate $name ($sql)")
    val cfg = st.configuration + (s"delta.constraints.$name" -> sql)
    val actions = Seq.newBuilder[JsonNode]
    if (st.minWriterVersion < 3) {
      val n = mapper.createObjectNode()
      val p = n.putObject("protocol")
      p.put("minReaderVersion", st.minReaderVersion)
      p.put("minWriterVersion", 3)
      actions += n
    } else if (st.minWriterVersion >= 7 &&
      !st.writerFeatures.contains("checkConstraints")) {
      val n = mapper.createObjectNode()
      val p = n.putObject("protocol")
      p.put("minReaderVersion", st.minReaderVersion)
      p.put("minWriterVersion", st.minWriterVersion)
      if (st.readerFeatures.nonEmpty) {
        val rf = p.putArray("readerFeatures")
        st.readerFeatures.foreach(rf.add)
      }
      val wf = p.putArray("writerFeatures")
      (st.writerFeatures :+ "checkConstraints").distinct.foreach(wf.add)
      actions += n
    }
    actions += metaDataAction(st.tableId, schema.json, st.partitionColumns,
      cfg)
    writeCommitFile(root, v + 1, actions.result(),
      operation = "ADD CONSTRAINT")
    v + 1
  }

  /** `ALTER TABLE DROP CONSTRAINT name` — metaData re-emit without it.
    * Unknown names refuse (typos must not silently "succeed").
    */
  def dropCheckConstraint(spark: SparkSession, root: String,
                          name: String): Long = {
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    val key = s"delta.constraints.$name"
    require(st.configuration.contains(key),
      s"DeltaLog.dropCheckConstraint: no constraint named $name")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    writeCommitFile(root, v + 1, Seq(metaDataAction(st.tableId,
      schema.json, st.partitionColumns, st.configuration - key)),
      operation = "DROP CONSTRAINT")
    v + 1
  }

  /** `ALTER TABLE … SET TBLPROPERTIES` — a metaData-only commit
    * merging `props` into the table configuration, with the PROTOCOL
    * co-upgraded when a property demands a higher writer floor
    * (Delta's own behavior: enabling changeDataFeed on a writer-2
    * table bumps it to 4 — legacy floors imply their feature sets, so
    * the bump is enumerable; a features-form table appends the named
    * feature instead). `delta.enableInCommitTimestamps` may be
    * ENABLED here (the monotonic chain starts at THIS commit, which
    * carries the first `inCommitTimestamp`) but never disabled or
    * unset — timestamp resolution over the existing ICT history would
    * silently break. `delta.columnMapping.*` changes refuse: flipping
    * the mode is a physical-layout migration (every field needs a
    * physicalName/id), not a property write.
    */
  def setTableProperties(spark: SparkSession, root: String,
                         props: Map[String, String]): Long = {
    require(props.nonEmpty, "DeltaLog.setTableProperties: empty props")
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritable(st, "setTableProperties")
    props.keys.find(_.startsWith("delta.columnMapping.")).foreach(k =>
      require(props.get(k) == st.configuration.get(k),
        s"DeltaLog.setTableProperties: $k is a physical-layout " +
          "declaration, not a flippable property — create the table " +
          "with the mapping mode it should keep"))
    if (props.get("delta.symlinkFormatManifest.enabled")
        .exists(_.trim.equalsIgnoreCase("true"))) {
      val dvd = st.files.map(_._1).count(st.fileDvs.contains)
      require(dvd == 0,
        s"DeltaLog.setTableProperties: $dvd active file(s) carry " +
          "deletion vectors — symlink-manifest readers see whole files " +
          "and would resurrect their deleted rows; compact the DVs " +
          "away before enabling delta.symlinkFormatManifest.enabled")
      val abs = st.files.count(_._1.startsWith("/"))
      require(abs == 0,
        s"DeltaLog.setTableProperties: $abs active file(s) are " +
          "absolute-path references (a shallow clone) — manifests " +
          "have no partition directory for them; compact the clone " +
          "into its own files before enabling " +
          "delta.symlinkFormatManifest.enabled")
    }
    val wasIct = st.configuration.get("delta.enableInCommitTimestamps")
      .exists(_.trim.equalsIgnoreCase("true"))
    val wantIct = props.get("delta.enableInCommitTimestamps")
      .map(_.trim.equalsIgnoreCase("true"))
    require(!(wasIct && wantIct.contains(false)),
      "DeltaLog.setTableProperties: inCommitTimestamps cannot be " +
        "disabled — existing-history timestamp resolution would break")
    val enablingIct = !wasIct && wantIct.contains(true)
    val cfg = st.configuration ++ props
    val needsCdf = cfg.get("delta.enableChangeDataFeed")
      .exists(_.trim.equalsIgnoreCase("true"))
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val actions = Seq.newBuilder[JsonNode]
    val legacyFloor = math.max(st.minWriterVersion,
      if (needsCdf) 4 else 2)
    if (enablingIct || st.minWriterVersion >= 7) {
      // features form. The base set differs by where the table starts:
      // CONVERTING a legacy table enumerates what its legacy floor
      // implied (those obligations already bind); a table ALREADY on
      // features keeps exactly its declared set — re-deriving from a
      // floor would inflate it with features it never declared
      // (columnMapping on an unmapped table), which external minimal
      // writers would then refuse to honor.
      val base =
        if (st.minWriterVersion >= 7) st.writerFeatures
        else legacyWriterFeatures(math.min(legacyFloor, 6))
      val feats = (base ++
        (if (needsCdf) Seq("changeDataFeed") else Nil) ++
        (if (enablingIct || wasIct) Seq("inCommitTimestamp") else Nil))
        .distinct
      if (st.minWriterVersion < 7 ||
          !feats.forall(st.writerFeatures.contains)) {
        val n = mapper.createObjectNode()
        val p = n.putObject("protocol")
        p.put("minReaderVersion", st.minReaderVersion)
        p.put("minWriterVersion", 7)
        if (st.readerFeatures.nonEmpty) {
          val rf = p.putArray("readerFeatures")
          st.readerFeatures.foreach(rf.add)
        }
        val wf = p.putArray("writerFeatures")
        feats.foreach(wf.add)
        actions += n
      }
    } else if (legacyFloor > st.minWriterVersion) {
      val n = mapper.createObjectNode()
      val p = n.putObject("protocol")
      p.put("minReaderVersion", st.minReaderVersion)
      p.put("minWriterVersion", legacyFloor)
      actions += n
    }
    actions += metaDataAction(st.tableId, schema.json,
      st.partitionColumns, cfg)
    writeCommitFile(root, v + 1, actions.result(),
      operation = "SET TBLPROPERTIES", ictStart = enablingIct)
    // ENABLING auto-manifests generates the full tree right here —
    // later commits then maintain it incrementally; without this, a
    // table re-enabling the property after manifest-less commits
    // would keep stale manifests for partitions those commits touched
    if (manifestEnabled(cfg) && !manifestEnabled(st.configuration))
      regenerateManifests(spark, root, None)
    v + 1
  }

  /** `ALTER TABLE … UNSET TBLPROPERTIES` — removes configuration keys
    * in one metaData commit. The protocol keeps its declared features
    * (a declaration is a floor, not a usage count). Refused:
    * `delta.enableInCommitTimestamps` (the chain must stay resolvable)
    * and `delta.columnMapping.*` (physical layout, not a property).
    */
  def unsetTableProperties(spark: SparkSession, root: String,
                           keys: Seq[String]): Long = {
    require(keys.nonEmpty, "DeltaLog.unsetTableProperties: empty keys")
    keys.foreach { k =>
      require(k != "delta.enableInCommitTimestamps",
        "DeltaLog.unsetTableProperties: inCommitTimestamps cannot be " +
          "unset — existing-history timestamp resolution would break")
      require(!k.startsWith("delta.columnMapping."),
        s"DeltaLog.unsetTableProperties: $k is physical layout, not a " +
          "removable property")
    }
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritable(st, "unsetTableProperties")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    writeCommitFile(root, v + 1, Seq(metaDataAction(st.tableId,
      schema.json, st.partitionColumns, st.configuration -- keys)),
      operation = "UNSET TBLPROPERTIES")
    v + 1
  }

  /** Delta schema-string primitive name of a widenable type. */
  private def deltaTypeName(dt: DataType): String = dt match {
    case ByteType => "byte"
    case ShortType => "short"
    case IntegerType => "integer"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case other => throw new IllegalArgumentException(
      s"DeltaLog: no delta type name for $other")
  }

  /** `ALTER TABLE … ALTER COLUMN c TYPE <wider>` — Delta's TYPE
    * WIDENING (PROTOCOL.md: Type Widening; the `typeWidening`
    * reader+writer feature). A metaData-only commit: the declared
    * schema re-emits with the widened type and the change recorded
    * under the field's `delta.typeChanges` metadata (fromType/toType,
    * the protocol's audit trail); ZERO data movement — files written
    * before keep their narrower physical form and every read path
    * here widens them natively (Spark's parquet readers promote
    * int32→int64 / float→double in the scan; the streaming source's
    * Group walk extracts by each file's OWN physical type and
    * upcasts). Allowed changes are the lossless integral chain
    * byte→short→int→long plus float→double — the set whose widened
    * values are bit-exact, so cross-engine hashes never move.
    * Refused: narrowing or cross-family changes (loud), partition
    * columns (their values live as directory strings typed by the
    * declared schema — a flip would silently re-type history), and
    * columns a CHECK constraint or generation expression mentions
    * (the stored SQL would re-resolve against a different type).
    * The protocol co-upgrades to the features form carrying
    * `typeWidening` in BOTH feature sets (legacy floors enumerate,
    * declared sets stay exact — the r19 discipline).
    */
  def widenColumnType(spark: SparkSession, root: String, column: String,
                      to: DataType): Long = {
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritable(st, "widenColumnType")
    requireWritableMapping(st, "widenColumnType")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val f = schema.fields.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(
        s"DeltaLog.widenColumnType: no column $column in ${schema.fieldNames.toSeq}"))
    val widens = (f.dataType, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
    require(widens,
      s"DeltaLog.widenColumnType: ${f.dataType.simpleString} → " +
        s"${to.simpleString} is not a supported widening (integral " +
        "chain byte→short→int→long, or float→double)")
    require(!st.partitionColumns.contains(column),
      s"DeltaLog.widenColumnType: $column is a partition column — its " +
        "recorded directory values are typed by the declared schema; " +
        "widening them would silently re-type history")
    requireNoStoredSqlOn(st, schema, column, "widenColumnType")
    val change = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("fromType", deltaTypeName(f.dataType))
      .putString("toType", deltaTypeName(to)).build()
    val prior =
      if (f.metadata.contains("delta.typeChanges"))
        f.metadata.getMetadataArray("delta.typeChanges")
      else Array.empty[org.apache.spark.sql.types.Metadata]
    val newMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata)
      .putMetadataArray("delta.typeChanges", prior :+ change).build()
    val widened = StructType(schema.fields.map(x =>
      if (x.name == column) x.copy(dataType = to, metadata = newMeta)
      else x))
    val actions = Seq.newBuilder[JsonNode]
    val needReader = !(st.minReaderVersion >= 3 &&
      st.readerFeatures.contains("typeWidening"))
    val needWriter = !(st.minWriterVersion >= 7 &&
      st.writerFeatures.contains("typeWidening"))
    if (needReader || needWriter) {
      val rf = ((if (st.minReaderVersion >= 3) st.readerFeatures
      else if (st.minReaderVersion >= 2 || mappingMode(st) != "none")
        Seq("columnMapping")
      else Seq.empty) :+ "typeWidening").distinct
      val wf = ((if (st.minWriterVersion >= 7) st.writerFeatures
      else legacyWriterFeatures(st.minWriterVersion)) :+ "typeWidening")
        .distinct
      val n = mapper.createObjectNode()
      val p = n.putObject("protocol")
      p.put("minReaderVersion", 3)
      p.put("minWriterVersion", 7)
      val rfa = p.putArray("readerFeatures"); rf.foreach(rfa.add)
      val wfa = p.putArray("writerFeatures"); wf.foreach(wfa.add)
      actions += n
    }
    actions += metaDataAction(st.tableId, widened.json,
      st.partitionColumns, st.configuration)
    writeCommitFile(root, v + 1, actions.result(),
      operation = "CHANGE COLUMN")
    v + 1
  }

  /** Columns a stored SQL expression textually references —
    * word-boundary identifier match, backquoted or bare. Conservative
    * by design: column DDL REFUSES when a CHECK constraint or a
    * generation expression mentions the column (the stored SQL would
    * silently break), trading false refusals on collision-prone names
    * for never corrupting a live rule — Delta refuses the same way.
    */
  private def exprMentions(sql: String, column: String): Boolean =
    ("(?i)(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(column) +
      "(?![A-Za-z0-9_])").r.findFirstIn(sql).isDefined

  private def requireNoStoredSqlOn(st: LogState, schema: StructType,
                                   column: String, op: String): Unit = {
    constraintsOf(st.configuration).foreach { case (name, sql) =>
      require(!exprMentions(sql, column),
        s"DeltaLog.$op: CHECK constraint $name references $column — " +
          "drop the constraint first")
    }
    schema.fields
      .filter(_.metadata.contains("delta.generationExpression"))
      .foreach { f =>
        val sql = f.metadata.getString("delta.generationExpression")
        require(f.name == column || !exprMentions(sql, column),
          s"DeltaLog.$op: generated column ${f.name}'s expression " +
            s"references $column — drop the generated column first")
      }
  }

  /** `ALTER TABLE … RENAME COLUMN` — the zero-rewrite rename column
    * mapping exists for: ONE metaData commit changes the field's
    * LOGICAL name while its `physicalName`/`id` (what data files
    * store, and what stats/partitionValues/blooms are keyed by) stay
    * put, so every existing file keeps reading untouched. Refused on
    * unmapped tables (their physical layout IS their logical names —
    * Delta requires mapping the same way), on unknown/taken names,
    * and when a CHECK constraint or another column's generation
    * expression references the column. Partition-column renames carry
    * through `partitionColumns` (logical there; the recorded
    * physical-keyed partitionValues stay valid).
    */
  def renameColumn(spark: SparkSession, root: String,
                   from: String, to: String): Long = {
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritable(st, "renameColumn")
    require(mappingMode(st) != "none",
      s"DeltaLog.renameColumn: $root has no column mapping — a rename " +
        "would orphan every data file's stored column; enable mapping " +
        "(mode name or id) first")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    require(schema.fieldNames.contains(from),
      s"DeltaLog.renameColumn: no column $from in $root")
    require(!schema.fieldNames.contains(to),
      s"DeltaLog.renameColumn: column $to already exists in $root")
    requireNoStoredSqlOn(st, schema, from, "renameColumn")
    val renamed = StructType(schema.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    writeCommitFile(root, v + 1, Seq(metaDataAction(st.tableId,
      renamed.json, st.partitionColumns.map(c => if (c == from) to else c),
      st.configuration)), operation = "RENAME COLUMN")
    v + 1
  }

  /** `ALTER TABLE … DROP COLUMN` — a metaData-only commit removes the
    * field from the declared schema; data files keep their physical
    * column (readers project by the remaining mapped names, so the
    * bytes become dead weight reclaimed by the next rewrite), which
    * is why the protocol gates the operation on column mapping. A
    * later re-add of the same LOGICAL name gets a FRESH
    * physicalName/id from [[assignMapping]] and therefore never
    * resurrects the dropped bytes. Refused: unmapped tables,
    * partition columns, the last column, and columns a CHECK
    * constraint or generation expression references.
    */
  def dropColumn(spark: SparkSession, root: String,
                 column: String): Long = {
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritable(st, "dropColumn")
    require(mappingMode(st) != "none",
      s"DeltaLog.dropColumn: $root has no column mapping — dropping " +
        "would shift what positional readers see; enable mapping " +
        "(mode name or id) first")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    require(schema.fieldNames.contains(column),
      s"DeltaLog.dropColumn: no column $column in $root")
    require(!st.partitionColumns.contains(column),
      s"DeltaLog.dropColumn: $column partitions $root — repartition " +
        "the table instead")
    require(schema.fields.length > 1,
      s"DeltaLog.dropColumn: $column is the last column of $root")
    requireNoStoredSqlOn(st, schema, column, "dropColumn")
    val remaining = StructType(schema.fields.filterNot(_.name == column))
    writeCommitFile(root, v + 1, Seq(metaDataAction(st.tableId,
      remaining.json, st.partitionColumns, st.configuration)),
      operation = "DROP COLUMN")
    v + 1
  }

  /** Stats key for `column`: under column mapping, recorded stats are
    * keyed by PHYSICAL name (both external writers and this one derive
    * them from the parquet footer, which stores physical fields).
    */
  private def statsKeyOf(st: LogState, column: String): String =
    if (mappingMode(st) != "none")
      st.schema.map(sch => physicalTopLevel(
        StructType(sch.filter(_.name == column)))
        .getOrElse(column, column)).getOrElse(column)
    else column

  private def statsOverlap(st: LogState, path: String, column: String,
                           lo: Long, hi: Long): Boolean =
    st.fileStats.get(path) match {
      case None => true
      case Some(s) =>
        val key = statsKeyOf(st, column)
        val n = mapper.readTree(s)
        val mn = n.path("minValues").path(key)
        val mx = n.path("maxValues").path(key)
        !(mn.isNumber && mx.isNumber) ||
          (mn.asLong() <= hi && mx.asLong() >= lo)
    }

  /** NULL-presence file skipping over recorded `nullCount`/
    * `numRecords`: `wantNull = true` keeps files with at least one
    * physical null; `wantNull = false` drops files that are ALL null
    * (nullCount == numRecords). Counts are physical, so both prunes
    * stay exact under deletion vectors — a DV removes rows, never
    * adds them. Absent or non-numeric counts keep the file.
    */
  private def statsNullKeep(st: LogState, path: String, column: String,
                            wantNull: Boolean): Boolean =
    st.fileStats.get(path) match {
      case None => true
      case Some(s) =>
        val key = statsKeyOf(st, column)
        val n = mapper.readTree(s)
        val nc = n.path("nullCount").path(key)
        val nr = n.path("numRecords")
        if (!nc.isNumber) true
        else if (wantNull) nc.asLong() > 0L
        else !nr.isNumber || nc.asLong() < nr.asLong()
    }

  /** STRING-range file skipping over recorded footer min/max. External
    * writers TRUNCATE long string stats, but truncation keeps the
    * bounds ENCLOSING (a truncated min is a prefix ≤ the true min; a
    * truncated max must be rounded UP by the writer to stay ≥ the true
    * max — Delta's own rule), so range pruning on truncated bounds is
    * still exact. Comparisons run only when all four bounds are pure
    * ASCII — there Java string order equals parquet's unsigned-byte
    * stats order equals the JSON rendering order; a non-ASCII recorded
    * bound keeps the file (callers skip pruning entirely on a
    * non-ASCII probe range), so order divergence above 0x7f can never
    * drop a matching file.
    */
  private def statsOverlapStr(st: LogState, path: String, column: String,
                              lo: String, hi: String): Boolean =
    st.fileStats.get(path) match {
      case None => true
      case Some(s) =>
        val key = statsKeyOf(st, column)
        val n = mapper.readTree(s)
        val mn = n.path("minValues").path(key)
        val mx = n.path("maxValues").path(key)
        def ascii(x: String) = x.forall(_ < 0x80)
        !(mn.isTextual && mx.isTextual) ||
          !(ascii(mn.asText()) && ascii(mx.asText())) ||
          (mn.asText() <= hi && mx.asText() >= lo)
    }

  /** DECIMAL-range file skipping: Delta stats render decimal bounds as
    * JSON numbers — compare them exactly as BigDecimal (no double
    * round-trip: a 38-digit decimal loses precision through asDouble).
    * Non-numeric or absent bounds keep the file.
    */
  private def statsOverlapDec(st: LogState, path: String, column: String,
                              lo: java.math.BigDecimal,
                              hi: java.math.BigDecimal): Boolean =
    st.fileStats.get(path) match {
      case None => true
      case Some(s) =>
        val key = statsKeyOf(st, column)
        val n = mapper.readTree(s)
        val mn = n.path("minValues").path(key)
        val mx = n.path("maxValues").path(key)
        !(mn.isNumber && mx.isNumber) ||
          (mn.decimalValue().compareTo(hi) <= 0 &&
            mx.decimalValue().compareTo(lo) >= 0)
    }

  /** DATE-range file skipping: Delta stats render dates as ISO
    * `YYYY-MM-DD` strings, whose lexicographic order equals date order
    * for four-digit years — bounds not matching that shape keep the
    * file (a five-digit or negative year would break the equivalence).
    */
  private val IsoDateRe = """\d{4}-\d{2}-\d{2}""".r
  private def statsOverlapDate(st: LogState, path: String, column: String,
                               lo: String, hi: String): Boolean =
    st.fileStats.get(path) match {
      case None => true
      case Some(s) =>
        val key = statsKeyOf(st, column)
        val n = mapper.readTree(s)
        val mn = n.path("minValues").path(key)
        val mx = n.path("maxValues").path(key)
        def iso(x: JsonNode) =
          x.isTextual && IsoDateRe.matches(x.asText())
        !(iso(mn) && iso(mx)) ||
          (mn.asText() <= hi && mx.asText() >= lo)
    }

  /** Inverse of [[decodePath]]: percent-encode a table-relative path the
    * way the protocol expects (spaces, '%', … escaped; '/', '=' kept).
    */
  private def encodePath(rel: String): String =
    new java.net.URI(null, null, rel, null).getRawPath

  /** Read the table AT Delta commit `version`, via the Delta log alone
    * (the graft manifest is never consulted) — both the external-table
    * ingest path and the round-trip check that [[sync]]'s log means
    * what the manifest meant. The schema is pinned from the log's
    * `metaData`, so an empty active set still returns the declared
    * shape (and mixed-footer unions resolve the Delta way: declared
    * schema wins). For a PARTITIONED table, partition-column values
    * come from each add's `partitionValues` and are attached as typed
    * literals per partition — a filter on a partition column
    * constant-folds to false on non-matching partitions and the
    * optimizer drops their scans entirely (partition pruning; pinned
    * by DeltaLogSpec via `inputFiles`).
    */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val st = replay(spark, root, version)
    assembleFiles(spark, root, st, st.files)
  }

  /** Build the DataFrame for a (possibly pruned) subset of a state's
    * active files — the shared assembly for [[readAt]] and the
    * stats-skipping read.
    */
  private def assembleFiles(spark: SparkSession, root: String, st: LogState,
                            files: Seq[(String, Map[String, String])]): DataFrame = {
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val (dvFiles, plainFiles) = files.partition(f => st.fileDvs.contains(f._1))
    val dvPart =
      if (dvFiles.isEmpty) Seq.empty
      else Seq(dvFilteredFiles(spark, root, st, schema, dvFiles))
    val plainPart =
      if (plainFiles.isEmpty) Seq.empty
      else Seq(assemblePlainFiles(spark, root, st, schema, plainFiles))
    (plainPart ++ dvPart) match {
      case Seq() =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case parts => parts.reduce(_ unionByName _)
    }
  }

  /** ALL DV-carrying files of an assembly in ONE tagged scan: deleted
    * positions anti-joined on (file tag, row_index) against one shared
    * executor-decoded position table (ONE broadcast build, not one per
    * file — reading a snapshot with 10 k DV'd files used to
    * materialize 10 k broadcasts), partition values re-attached
    * through a broadcast (tag → pv) dim of file-count rows. The
    * `_metadata` columns ride the scan's own select (unreachable after
    * any projection).
    */
  private def dvFilteredFiles(spark: SparkSession, root: String,
      st: LogState, schema: StructType,
      files: Seq[(String, Map[String, String])]): DataFrame = {
    val pcSet = st.partitionColumns.toSet
    val dataSchema = StructType(schema.filterNot(f => pcSet(f.name)))
    val (physSchema, physMap) = readSchemaFor(st, dataSchema)
    val rels = files.map(_._1)
    val tagging = chooseTagging(root, rels)
      .getOrElse(synthesizedTagging(spark, root, rels))
    val dvs = rels.flatMap(rel => st.fileDvs.get(rel).map(rel -> _)).toMap
    def toLogical = dataSchema.fields.map(f =>
      toLogicalField(f, physMap(f.name)))
    val live = spark.read.schema(physSchema)
      .parquet(rels.map(r => resolvePath(root, r).toString): _*)
      .select(toLogical :+ tagging.tagExpr.as(SrcTagCol) :+
        col("_metadata.row_index").as("__graft_pos"): _*)
      .join(dvPositionsByName(spark, root, dvs, tagging.tagOf),
        Seq(SrcTagCol, "__graft_pos"), "left_anti")
      .drop("__graft_pos")
    if (pcSet.isEmpty) live.drop(SrcTagCol)
    else {
      val pvSchema = StructType(
        StructField(SrcTagCol, StringType, nullable = false) +:
          st.partitionColumns.map(c =>
            StructField(s"__graft_pv_$c", StringType, nullable = true)))
      val pvRows: Seq[Row] = files.map { case (rel, pv) =>
        Row.fromSeq(tagging.tagOf(rel) +: st.partitionColumns.map { c =>
          val key = pvKeyOf(st, schema, c, pv).getOrElse(
            throw new IllegalArgumentException(
              s"DeltaLog: add $rel lacks partitionValues for declared " +
                s"partition column $c"))
          pv(key)
        })
      }
      val pvDf = org.apache.spark.sql.functions.broadcast(
        spark.createDataFrame(pvRows.asJava, pvSchema))
      live.join(pvDf, Seq(SrcTagCol))
        .select(schema.fields.map { f =>
          if (pcSet(f.name))
            col(s"__graft_pv_${f.name}").cast(f.dataType).as(f.name)
          else col(f.name)
        }.toIndexedSeq: _*)
    }
  }

  /** partitionValues key for logical partition column `c` — PHYSICAL
    * under name-mode column mapping (that is what mapped writers record;
    * logical accepted as a fallback for writers that kept it).
    */
  private def pvKeyOf(st: LogState, schema: StructType, c: String,
                      pv: Map[String, String]): Option[String] = {
    val candidates =
      if (mappingMode(st) != "none")
        Seq(physicalTopLevel(StructType(schema.filter(_.name == c)))
          .getOrElse(c, c), c)
      else Seq(c)
    candidates.find(pv.contains)
  }

  private def assemblePlainFiles(spark: SparkSession, root: String,
                                 st: LogState, schema: StructType,
                                 files: Seq[(String, Map[String, String])]): DataFrame = {
    if (st.partitionColumns.isEmpty)
      readDataFiles(spark, st, schema,
        files.map(f => resolvePath(root, f._1).toString))
    else {
      val pcSet = st.partitionColumns.toSet
      val missing = pcSet.filterNot(schema.fieldNames.contains)
      require(missing.isEmpty,
        s"DeltaLog: partitionColumns $missing not in declared schema")
      val dataSchema = StructType(schema.filterNot(f => pcSet(f.name)))
      // an add whose partitionValues OMITS a declared partition column
      // is malformed (unknown mapping, broken writers): treating absent
      // as null would surface wrong rows — fail loudly instead
      def recordedPv(f: (String, Map[String, String])): Seq[Option[String]] =
        st.partitionColumns.map { c =>
          val key = pvKeyOf(st, schema, c, f._2).getOrElse(
            throw new IllegalArgumentException(
              s"DeltaLog: add ${f._1} lacks partitionValues for declared " +
                s"partition column $c"))
          Option(f._2(key))
        }
      val physMap = physicalWriteMap(st, schema)
      val physPcs = st.partitionColumns.map(c => physMap.getOrElse(c, c))
      // FAST PATH — hive-consistent layout (every rel sits under
      // root-relative `pc=value/...` dirs whose parsed values EQUAL the
      // recorded partitionValues, the shape this writer and Spark
      // produce): ONE basePath-discovery relation attaches partition
      // columns natively. The per-partition plan union below is kept
      // only for external adds whose paths don't encode their values —
      // at 10 k partitions a 10 k-branch union is itself a driver
      // scale problem.
      val hiveConsistent = files.forall { f =>
        !f._1.startsWith("/") &&
          (try {
            partitionValuesOf(f._1, physPcs).toSeq.sortBy(_._1) ==
              physPcs.zip(recordedPv(f)).map { case (c, v) =>
                c -> v.orNull }.sortBy(_._1)
          } catch { case _: IllegalArgumentException => false })
      }
      if (hiveConsistent) {
        val (dataScan, dataPhysMap) = readSchemaFor(st, dataSchema)
        val physFull = StructType(dataScan.fields ++
          schema.fields.filter(f => pcSet(f.name)).map(f =>
            f.copy(name = physMap.getOrElse(f.name, f.name))))
        spark.read.option("basePath", root).schema(physFull)
          .parquet(files.map(f => resolvePath(root, f._1).toString): _*)
          .select(schema.fields.map { f =>
            if (pcSet(f.name))
              col(physMap.getOrElse(f.name, f.name)).as(f.name)
            else toLogicalField(f, dataPhysMap.getOrElse(f.name, f.name))
          }.toIndexedSeq: _*)
      } else {
        val byPartition = files.groupBy(recordedPv)
        val parts = byPartition.toSeq.sortBy(_._1.mkString(" "))
          .map { case (pvals, group) =>
            val pvByCol = st.partitionColumns.zip(pvals).toMap
            val withPv = readDataFiles(spark, st, dataSchema,
              group.map(f => resolvePath(root, f._1).toString))
            schema.fields.foldLeft(withPv) { (df, f) =>
              if (!pcSet(f.name)) df
              else df.withColumn(f.name,
                pvByCol(f.name) match {
                  case Some(s) => lit(s).cast(f.dataType)
                  case None => lit(null).cast(f.dataType)
                })
            }.select(schema.fieldNames.map(col).toSeq: _*)
          }
        parts.reduce(_ unionByName _)
      }
    }
  }

  /** Metadata-only COUNT(*) over the CURRENT snapshot from the log
    * alone — no footer or data IO: sums `numRecords` from every active
    * add's `stats`. Requires stats on every active file (graft-written
    * logs carry them; an external log without stats fails loudly
    * rather than undercounting). Output is ONE row: (n_rows, n_files).
    */
  def statsCount(spark: SparkSession, root: String): DataFrame = {
    val st = replay(spark, root, currentVersion(root))
    val counts = st.files.map { case (p, _) =>
      val s = st.fileStats.getOrElse(p, throw new IllegalStateException(
        s"DeltaLog.statsCount: active file $p has no stats — cannot " +
          "count from metadata"))
      val n = mapper.readTree(s).path("numRecords")
      require(n.isNumber, s"DeltaLog.statsCount: stats of $p lack numRecords")
      // physical rows minus the file's deleted positions (descriptor
      // cardinality) — still zero data IO
      n.asLong() - st.fileDvs.get(p).map(_.cardinality).getOrElse(0L)
    }
    spark.createDataFrame(Seq((counts.sum, counts.size.toLong)))
      .toDF("n_rows", "n_files")
  }

  /** Data-skipping read: rows of the current snapshot with `column` in
    * [lo, hi], where files whose stats range cannot intersect the
    * interval are pruned BEFORE any IO — the Delta data-skipping path
    * (files without stats, or without min/max for the column, are
    * conservatively kept; NULL rows never match the filter, so nullCount
    * plays no part). The spec pins that non-matching files vanish from
    * `inputFiles`.
    */
  /** One conjunct of a [[readWhere]] filter. Real predicates are
    * conjunctions — a unified read intersects EVERY predicate's
    * metadata layers (numeric/string stats ranges, footer-bloom
    * points, partition values) before any data IO, so the scanned
    * file set is the intersection of what each column would prune
    * alone.
    */
  sealed trait ColumnPredicate { def column: String }
  object ColumnPredicate {
    /** `column BETWEEN lo AND hi` over a numeric (integral) column —
      * pruned by the recorded stats range.
      */
    case class LongRange(column: String, lo: Long, hi: Long)
      extends ColumnPredicate {
      require(lo <= hi, s"LongRange($column): empty interval [$lo, $hi]")
    }
    /** `column = value` — stats range AND footer-bloom exact-negative
      * layers (the bloom hashes by each file's own physical form).
      */
    case class LongPoint(column: String, value: Long)
      extends ColumnPredicate
    /** `column BETWEEN lo AND hi` lexicographically — ASCII-guarded
      * truncation-enclosing string stats ([[readWhereString]]'s rule).
      */
    case class StringRange(column: String, lo: String, hi: String)
      extends ColumnPredicate {
      require(lo <= hi, s"StringRange($column): empty range [$lo, $hi]")
    }
    /** `column = value` on strings — stats + footer bloom. */
    case class StringPoint(column: String, value: String)
      extends ColumnPredicate
    /** `column BETWEEN lo AND hi` on a DATE column — pruned through
      * the ISO-rendered date stats ([[statsOverlapDate]]).
      */
    case class DateRange(column: String, lo: java.time.LocalDate,
                         hi: java.time.LocalDate) extends ColumnPredicate {
      require(!lo.isAfter(hi), s"DateRange($column): empty range [$lo, $hi]")
    }
    /** `column = value` on a PARTITION column, in the add's rendered
      * partition-value form (`None` = the null partition) — planning-
      * time pruning with zero data IO, exact by construction.
      */
    case class PartitionEquals(column: String, value: Option[String])
      extends ColumnPredicate
    /** `column IN (values)` on an integral column: a file stays when
      * ANY value lands inside its stats range, then the footer bloom
      * answers the survivors per value (exact negatives — the same
      * two layers as [[LongPoint]], unioned over the list). Sized for
      * human-written IN lists; a MILLION-key probe belongs in a
      * semi-join (the MERGE candidate path), not a predicate list.
      */
    case class LongIn(column: String, values: Seq[Long])
      extends ColumnPredicate {
      require(values.nonEmpty, s"LongIn($column): empty value list")
    }
    /** `column IN (values)` on strings — stats + footer bloom per
      * value, ASCII-guarded like [[StringPoint]].
      */
    case class StringIn(column: String, values: Seq[String])
      extends ColumnPredicate {
      require(values.nonEmpty, s"StringIn($column): empty value list")
    }
    /** `column IS NULL` — pruned through the recorded per-column
      * `nullCount`: a file whose nullCount is 0 holds no matching
      * rows. Stats are PHYSICAL, so the prune stays exact under
      * deletion vectors (a DV only removes rows — it cannot turn a
      * zero-null file into one with nulls).
      */
    case class IsNull(column: String) extends ColumnPredicate
    /** `column IS NOT NULL` — a file whose nullCount equals its
      * numRecords is all-null physically, so no surviving row can
      * match; everything else is kept and the residual filter decides.
      */
    case class IsNotNull(column: String) extends ColumnPredicate
  }

  /** Read the current snapshot under a CONJUNCTION of predicates with
    * every metadata-skipping layer applied per file BEFORE any data
    * IO: partition-value equality and stats ranges first (free — they
    * ride the log), then footer-bloom point probes on the survivors
    * only (footer bytes ∝ surviving candidates). The returned frame
    * carries the exact residual filter, so results are correct even
    * where pruning is best-effort. The single-column
    * `readWhereLong/Point/String/StringPoint` entry points are
    * one-predicate forms of this.
    */
  def readWhere(spark: SparkSession, root: String,
                preds: Seq[ColumnPredicate]): DataFrame = {
    import ColumnPredicate._
    require(preds.nonEmpty, "DeltaLog.readWhere: at least one predicate")
    val st = replay(spark, root, currentVersion(root))
    val conf = spark.sparkContext.hadoopConfiguration
    val pcSet = st.partitionColumns.toSet
    val physPc: Map[String, String] =
      st.schema.map(physicalTopLevel).getOrElse(Map.empty)
    preds.foreach {
      case PartitionEquals(c, _) =>
        require(pcSet(c),
          s"DeltaLog.readWhere: $c is not a partition column — use a " +
            "data-column predicate")
      case p =>
        require(st.schema.exists(_.fieldNames.contains(p.column)),
          s"DeltaLog.readWhere: ${p.column} not in schema")
        require(!pcSet(p.column),
          s"DeltaLog.readWhere: ${p.column} is a partition column — " +
            "use PartitionEquals")
    }
    // log-resident layers first (free), footer-bloom probes last and
    // only on the files every cheap layer kept
    def keepCheap(rel: String, pv: Map[String, String],
                  p: ColumnPredicate): Boolean = p match {
      case LongRange(c, lo, hi) => statsOverlap(st, rel, c, lo, hi)
      case LongPoint(c, v) => statsOverlap(st, rel, c, v, v)
      case StringRange(c, lo, hi) =>
        !(lo + hi).forall(_ < 0x80) || statsOverlapStr(st, rel, c, lo, hi)
      case StringPoint(c, v) =>
        !v.forall(_ < 0x80) || statsOverlapStr(st, rel, c, v, v)
      case DateRange(c, lo, hi) =>
        // a probe bound outside the 4-digit-year ISO shape (year ≤ 0 or
        // > 9999 renders with a sign/5 digits) breaks the lexicographic
        // equivalence — keep the file, the residual filter is exact
        !(IsoDateRe.matches(lo.toString) && IsoDateRe.matches(hi.toString)) ||
          statsOverlapDate(st, rel, c, lo.toString, hi.toString)
      case PartitionEquals(c, v) =>
        pv.get(physPc.getOrElse(c, c)).orElse(pv.get(c)) match {
          case Some(rec) => Option(rec) == v
          case None => true // pv not recorded for c: conservative keep
        }
      case IsNull(c) => statsNullKeep(st, rel, c, wantNull = true)
      case IsNotNull(c) => statsNullKeep(st, rel, c, wantNull = false)
      case LongIn(c, vs) => vs.exists(v => statsOverlap(st, rel, c, v, v))
      case StringIn(c, vs) => vs.exists(v =>
        !v.forall(_ < 0x80) || statsOverlapStr(st, rel, c, v, v))
    }
    def keepBloom(rel: String, p: ColumnPredicate): Boolean = p match {
      case LongPoint(c, v) =>
        bloomKeepsFile(resolvePath(root, rel), statsKeyOf(st, c),
          fieldIdOf(st, c), Seq(java.lang.Long.valueOf(v)), conf)
      case StringPoint(c, v) =>
        bloomKeepsFile(resolvePath(root, rel), statsKeyOf(st, c),
          fieldIdOf(st, c), Seq(v), conf)
      case LongIn(c, vs) =>
        bloomKeepsFile(resolvePath(root, rel), statsKeyOf(st, c),
          fieldIdOf(st, c), vs.map(java.lang.Long.valueOf), conf)
      case StringIn(c, vs) =>
        bloomKeepsFile(resolvePath(root, rel), statsKeyOf(st, c),
          fieldIdOf(st, c), vs, conf)
      case _ => true
    }
    val kept = st.files
      .filter { case (rel, pv) => preds.forall(keepCheap(rel, pv, _)) }
      .filter { case (rel, _) => preds.forall(keepBloom(rel, _)) }
    val residual = preds.map {
      case LongRange(c, lo, hi) => col(c) >= lo && col(c) <= hi
      case LongPoint(c, v) => col(c) === v
      case StringRange(c, lo, hi) => col(c) >= lo && col(c) <= hi
      case StringPoint(c, v) => col(c) === v
      case DateRange(c, lo, hi) =>
        col(c) >= java.sql.Date.valueOf(lo) &&
          col(c) <= java.sql.Date.valueOf(hi)
      case PartitionEquals(c, v) => v match {
        // partition columns attach as typed literals per partition, so
        // this residual constant-folds and the optimizer drops
        // non-matching scans — belt on exact suspenders
        case Some(x) => col(c).cast(StringType) === x
        case None => col(c).isNull
      }
      case IsNull(c) => col(c).isNull
      case IsNotNull(c) => col(c).isNotNull
      case LongIn(c, vs) => col(c).isin(vs: _*)
      case StringIn(c, vs) => col(c).isin(vs: _*)
    }.reduce(_ && _)
    assembleFiles(spark, root, st, kept).filter(residual)
  }

  def readWhereLong(spark: SparkSession, root: String, column: String,
                    lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"DeltaLog.readWhereLong: empty interval [$lo, $hi]")
    readWhere(spark, root, Seq(ColumnPredicate.LongRange(column, lo, hi)))
  }

  /** Nullability and field metadata are write-path metadata, not
    * physical schema — the shared normalization for schema-shape
    * checks ([[commitData]] and the streaming sink).
    */
  private[graft] def normSchema(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = normSchema(f.dataType), nullable = true,
        metadata = Metadata.empty)))
    case a: ArrayType => a.copy(elementType = normSchema(a.elementType),
      containsNull = true)
    case m: MapType => m.copy(valueType = normSchema(m.valueType),
      valueContainsNull = true)
    case other => other
  }

  /** Commit ALREADY-STAGED parquet files (written by the streaming
    * sink's executors under `.graft_staging`) as one append, guarded
    * by a txn watermark: a replayed epoch — Spark re-running a commit
    * after driver recovery — is a NO-OP that just discards its staged
    * files, which is what makes the DSv2 sink exactly-once. Creates
    * the table (protocol + metaData from `schemaJson`) at version 0;
    * later epochs must match the declared schema shape. Flat tables
    * only; operation `STREAMING UPDATE` (Delta's name for it).
    */
  private[graft] def commitStreamFiles(spark: SparkSession, root: String,
      schemaJson: String, staged: Seq[(Path, Map[String, String])],
      txn: (String, Long),
      partitionCols: Seq[String] = Seq.empty): Unit = {
    val v = currentVersion(root) + 1
    val prior = if (v == 0L) None else Some(replay(spark, root, v - 1))
    prior.foreach { st =>
      // replay no-op FIRST: the original epoch already passed every
      // check below — a redelivery must discard quietly no matter what
      val applied = st.txnVersions.get(txn._1).exists(_ >= txn._2)
      if (applied) { staged.foreach(s => Files.deleteIfExists(s._1)); return }
      requireWritable(st, "commitStreamFiles")
      requireWritableMapping(st, "commitStreamFiles")
      require(st.partitionColumns == partitionCols,
        s"DeltaLog.commitStreamFiles: table is partitioned by " +
          s"${st.partitionColumns}, the sink resolved $partitionCols")
      val incoming = DataType.fromJson(schemaJson).asInstanceOf[StructType]
      st.schema.foreach { sch =>
        require(normSchema(sch) == normSchema(incoming),
          s"DeltaLog.commitStreamFiles: epoch schema $incoming does not " +
            s"match the table's $sch")
        // the sink stages raw executor-written rows — it does not run
        // the batch writer's invariant machinery, so tables carrying
        // write OBLIGATIONS refuse rather than silently skip them
        require(generationExprs(sch).isEmpty && identityInfo(sch).isEmpty,
          "DeltaLog.commitStreamFiles: the table declares generated/" +
            "identity columns — the streaming sink does not compute " +
            "them; write through commitFlat")
        sch.fields.filter(!_.nullable).foreach(f => require(
          incoming.fieldNames.contains(f.name) &&
            !incoming(f.name).nullable,
          s"DeltaLog.commitStreamFiles: ${f.name} is declared NOT NULL " +
            "but the stream's schema is nullable — the sink cannot " +
            "prove the invariant"))
      }
      require(constraintsOf(st.configuration).isEmpty,
        "DeltaLog.commitStreamFiles: the table declares CHECK " +
          "constraints the streaming sink does not enforce; write " +
          "through commitFlat")
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val actions = Seq.newBuilder[JsonNode]
    if (v == 0L) {
      val protocol = mapper.createObjectNode()
      val p = protocol.putObject("protocol")
      p.put("minReaderVersion", 1)
      p.put("minWriterVersion", 2)
      actions += protocol
      val tableId = java.util.UUID.nameUUIDFromBytes(
        ("graft-delta:" + root).getBytes("UTF-8")).toString
      actions += metaDataAction(tableId, schemaJson, partitionCols,
        Map.empty)
    }
    val n = mapper.createObjectNode()
    val t = n.putObject("txn")
    t.put("appId", txn._1)
    t.put("version", txn._2)
    actions += n
    // mapped tables: partition DIRECTORIES and action partitionValues
    // key by the PHYSICAL partition-column name (the writer's staged
    // pv maps are logical-keyed)
    val pcPhys = prior.flatMap(_.schema) match {
      case Some(sch) if prior.exists(mappingMode(_) != "none") =>
        val phys = physicalTopLevel(sch)
        partitionCols.map(c => c -> phys.getOrElse(c, c)).toMap
      case _ => partitionCols.map(c => c -> c).toMap
    }
    staged.foreach { case (p, pv) =>
      // partitioned tables: the staged file moves into its hive-style
      // partition directory, partitionValues ride the add
      val segs = partitionCols.map { c =>
        val value = pv.getOrElse(c, throw new IllegalArgumentException(
          s"DeltaLog.commitStreamFiles: staged file $p lacks a value " +
            s"for partition column $c"))
        pcPhys(c) + "=" + (if (value == null) "__HIVE_DEFAULT_PARTITION__"
                           else escapeHive(value))
      }
      val rel = (segs :+ p.getFileName.toString).mkString("/")
      val target = Paths.get(root, rel)
      Files.createDirectories(target.getParent)
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      val physPv = pv.map { case (c, v2) => pcPhys.getOrElse(c, c) -> v2 }
      actions += addActionNode(root, rel, physPv, dataChange = true, conf)
    }
    Files.createDirectories(logDir(root))
    writeCommitFile(root, v, actions.result(),
      operation = "STREAMING UPDATE")
    prior.foreach(postCommit(spark, root, _, v))
  }

  /** Executor-side staging dir for the streaming sink (same filesystem
    * as the table by construction, so the commit-time rename is
    * atomic).
    */
  private[graft] def streamStagingDir(root: String): Path =
    stagingBase(root)

  /** `CONVERT TO DELTA` — adopt an EXISTING parquet directory in place:
    * commit 0 declares protocol + metaData (schema from the parquet
    * footers via Spark's own merged read schema; partition columns
    * from the caller, typed from the hive paths' `key=value` segments
    * the way Spark infers them — caller passes their declared types
    * via `partitionSchema`) and one `add` per data file with footer
    * stats, so file skipping works from the first read. ZERO data
    * rewritten or moved — the defining property of CONVERT. Refuses a
    * directory that already has a `_delta_log`. Returns version 0.
    *
    * Scale: one footer read per file for stats (the same IO Delta's
    * own CONVERT pays); file listing is a local walk here — on object
    * stores the manifest-building step would be the distributed
    * countFast-style list.
    */
  def convertToDelta(spark: SparkSession, root: String,
                     partitionSchema: StructType = new StructType()): Long = {
    require(!Files.isDirectory(logDir(root)),
      s"DeltaLog.convertToDelta: $root already has a _delta_log")
    require(Files.isDirectory(Paths.get(root)),
      s"DeltaLog.convertToDelta: $root is not a directory")
    val pcs = partitionSchema.fieldNames.toSeq
    val rootPath = Paths.get(root)
    val walk = Files.walk(rootPath)
    val rels =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => rootPath.relativize(p).toString
          .replace(java.io.File.separatorChar, '/'))
        // hive/Spark listing semantics: underscore- and dot-prefixed
        // segments (_change_data, _SUCCESS dirs, hidden staging) are
        // metadata, never table data
        .filterNot(_.split('/').exists(seg =>
          seg.startsWith("_") || seg.startsWith(".")))
        .toSeq.sorted
      finally walk.close()
    require(rels.nonEmpty,
      s"DeltaLog.convertToDelta: no parquet files under $root")
    // data schema from Spark's parquet reader (footer-merged), the
    // partition columns appended with their declared types
    val dataSchema = spark.read.parquet(
      rels.map(r => Paths.get(root, r).toString): _*).schema
    pcs.foreach(c => require(!dataSchema.fieldNames.contains(c),
      s"DeltaLog.convertToDelta: partition column $c also exists in " +
        "the data files"))
    val schema = StructType(dataSchema.fields ++ partitionSchema.fields)
    val conf = spark.sparkContext.hadoopConfiguration
    val actions = Seq.newBuilder[JsonNode]
    val protocol = mapper.createObjectNode()
    val p = protocol.putObject("protocol")
    p.put("minReaderVersion", 1)
    p.put("minWriterVersion", 2)
    actions += protocol
    val tableId = java.util.UUID.nameUUIDFromBytes(
      ("graft-delta:" + root).getBytes("UTF-8")).toString
    actions += metaDataAction(tableId, schema.json, pcs, Map.empty)
    rels.foreach { rel =>
      val pv = if (pcs.isEmpty) Map.empty[String, String]
               else partitionValuesOf(rel, pcs)
      actions += addActionNode(root, rel, pv, dataChange = true, conf)
    }
    Files.createDirectories(logDir(root))
    writeCommitFile(root, 0L, actions.result(), operation = "CONVERT")
    0L
  }

  /** Point lookup `column = value` with TWO file-skipping layers: the
    * footer-stats range check first (free — stats ride the log), then
    * each surviving file's parquet BLOOM FILTER (footer-bytes IO only,
    * never data pages): a bloom that answers "definitely absent" drops
    * the file. On an UNSORTED column every file spans the value range
    * and stats alone prune NOTHING — blooms are what make a point
    * lookup on a 100 TB unsorted fact open only the files that can
    * match. Files without a bloom (not written with [[bloomOptions]])
    * conservatively stay. Deterministic: parquet blooms are xxhash —
    * the same data always prunes the same way.
    */
  def readWhereLongPoint(spark: SparkSession, root: String,
                         column: String, value: Long): DataFrame =
    readWhere(spark, root, Seq(ColumnPredicate.LongPoint(column, value)))

  /** STRING-range data-skipping read — [[readWhereLong]]'s sibling for
    * lexicographic key ranges (order-id prefixes, ULID/KSUID time
    * windows): files whose recorded string min/max cannot intersect
    * [lo, hi] are pruned before any IO. Truncated external stats stay
    * enclosing ([[statsOverlapStr]]); a non-ASCII bound on either side
    * keeps the file (pruning is best-effort, the residual filter is
    * exact).
    */
  def readWhereString(spark: SparkSession, root: String, column: String,
                      lo: String, hi: String): DataFrame = {
    require(lo <= hi, s"DeltaLog.readWhereString: empty range [$lo, $hi]")
    readWhere(spark, root, Seq(ColumnPredicate.StringRange(column, lo, hi)))
  }

  /** [[readWhereLongPoint]]'s STRING sibling — the reference's
    * production point-lookup shape (string `order_id`): truncated-stats
    * range check (truncation keeps bounds enclosing, see
    * [[statsOverlapStr]]) then the footer bloom's exact-negative
    * answer. Files written by [[mergeKey]] carry a bloom on the merge
    * key automatically, so the table's own upsert traffic stays
    * point-prunable.
    */
  def readWhereStringPoint(spark: SparkSession, root: String,
                           column: String, value: String): DataFrame =
    readWhere(spark, root, Seq(ColumnPredicate.StringPoint(column, value)))

  /** Footer-only bloom probe: true when the file might contain ANY of
    * `keys` (LONG or STRING) in the column named `physName` — or when
    * no bloom was written (conservatively kept). On an id-mode table
    * the file's stored column name may legally differ from the
    * declared physicalName, so when `fieldId` is given the footer
    * SCHEMA resolves the actual stored name by field id first (the
    * q287 resolution rule — a name match there could silently probe a
    * different column). One footer open per file regardless of key
    * count; data pages are never read.
    */
  private def bloomKeepsFile(file: Path, physName: String,
      fieldId: Option[Long], keys: Seq[Any],
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(file.toString), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val colName = fieldId.flatMap { id =>
        r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .find(f => Option(f.getId).exists(_.intValue().toLong == id))
          .map(_.getName)
      }.getOrElse(physName)
      r.getFooter.getBlocks.asScala.exists { block =>
        block.getColumns.asScala
          .find(_.getPath.toDotString == colName) match {
          case None => true
          case Some(cm) =>
            val bf = r.getBloomFilterDataReader(block).readBloomFilter(cm)
            if (bf == null) true
            else {
              // hash by the FILE's physical form: an int32 column's
              // bloom hashed 4-byte ints at write time — probing it
              // with hash(long) would answer garbage (silently keeping
              // OR dropping the wrong files); a long key that cannot
              // narrow to the stored int32 cannot be in the file
              import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
              val ptn = cm.getPrimitiveType.getPrimitiveTypeName
              keys.exists {
                case l: java.lang.Long => ptn match {
                  case PrimitiveTypeName.INT64 =>
                    bf.findHash(bf.hash(l.longValue()))
                  case PrimitiveTypeName.INT32 =>
                    val v = l.longValue()
                    v >= Int.MinValue && v <= Int.MaxValue &&
                      bf.findHash(bf.hash(v.toInt))
                  case _ => true // unexpected physical form: keep
                }
                case s: String if ptn == PrimitiveTypeName.BINARY =>
                  bf.findHash(bf.hash(
                    org.apache.parquet.io.api.Binary.fromString(s)))
                case _ => true // unprobeable key/physical pair: keep
              }
            }
        }
      }
    } finally r.close()
  }

  /** Declared column-mapping field id of `column` on an id-mode table
    * (None otherwise) — the footer-resolution key [[bloomKeepsFile]]
    * needs where stored names are not authoritative.
    */
  private def fieldIdOf(st: LogState, column: String): Option[Long] =
    if (mappingMode(st) != "id") None
    else st.schema.flatMap(_.fields.find(_.name == column))
      .filter(_.metadata.contains(ColumnIdKey))
      .map(_.metadata.getLong(ColumnIdKey))

  /** Copy-on-write DELETE of rows with `column` in [lo, hi] over the
    * current snapshot, committed as `remove`+`add` with
    * `dataChange=true`. File-skipping applies BEFORE any IO: only files
    * whose stats range intersects the interval are touched; a touched
    * file that loses every row becomes a pure `remove`. When `column`
    * IS a partition column the delete is pure metadata — whole
    * partitions drop with zero data IO (partition values must then be
    * numeric). No-op (no commit) when nothing matches. Returns the
    * table version afterwards.
    *
    * Ownership: direct DML makes the Delta log the table's source of
    * truth — on a [[Snapshots]]-synced root, [[sync]] refuses to run
    * afterwards (by design) and `Snapshots.vacuum` must not run (its
    * manifests no longer cover the live file set).
    */
  def deleteWhereLong(spark: SparkSession, root: String, column: String,
                      lo: Long, hi: Long): Long = {
    require(lo <= hi, s"DeltaLog.deleteWhereLong: empty interval [$lo, $hi]")
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritableMapping(st, "deleteWhereLong")
    requireNotAppendOnly(st, "deleteWhereLong")
    requireWritable(st, "deleteWhereLong")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val pcSet = st.partitionColumns.toSet
    val conf = spark.sparkContext.hadoopConfiguration
    val actions = Seq.newBuilder[JsonNode]
    var touched = 0
    if (pcSet(column)) {
      st.files.foreach { case (rel, pv) =>
        val key = pvKeyOf(st, schema, column, pv).getOrElse(
          throw new IllegalArgumentException(
            s"DeltaLog.deleteWhereLong: add $rel lacks partitionValues " +
              s"for declared partition column $column"))
        val inRange = Option(pv(key)).exists { s =>
          try { val x = s.toLong; x >= lo && x <= hi }
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"DeltaLog.deleteWhereLong: partition value '$s' of " +
                s"$column is not numeric") }
        }
        if (inRange) { actions += removeActionNode(rel, true); touched += 1 }
      }
    } else {
      val dataSchema = StructType(schema.filterNot(f => pcSet(f.name)))
      val overlapping = st.files
        .filter { case (p, _) => statsOverlap(st, p, column, lo, hi) }
      val matches = col(column) >= lo && col(column) <= hi
      // stats say overlap, but overlap ≠ match: rewriting a file no row
      // of which matches would poison any later readAppendsSince over
      // the tail for a change that changed nothing. ONE probe job over
      // the predicate column finds the exact touched set.
      val candDvs = overlapping
        .flatMap(f => st.fileDvs.get(f._1).map(f._1 -> _)).toMap
      val exactTouched = probeTouched(spark, root, overlapping,
        StructType(Seq(dataSchema(column))), _.filter(matches), st,
        candDvs)
      val touchedDvs = candDvs.filter(d =>
        exactTouched.exists(_._1 == d._1))
      // Change data feed: a partial-file DELETE cannot be synthesized
      // from its remove+add pair (survivor rows would read as
      // delete+reinsert), so when CDF is on the matched rows land in a
      // CDC file — one per touched partition, predicate-pushed re-read
      // of only the touched source files (still on disk until vacuum).
      // The cdc write reads only PRE-rewrite files and writes only under
      // _change_data, so it is independent of the rewrite job — launched
      // here so the two jobs OVERLAP (FIFO scheduling back-fills the
      // rewrite's task tail) instead of paying two sequential fixed
      // costs; an orphaned cdc file from a failed rewrite is never
      // referenced by any commit and falls to vacuum.
      val cdcFut: Option[Future[Seq[JsonNode]]] =
        if (!cdfEnabled(st)) None
        else Some(Future {
          exactTouched.groupBy(_._2).toSeq.sortBy(_._1.mkString(" "))
            .map { case (pv, group) =>
              // live rows only: a row the file's prior DV already
              // deleted must not re-emit as a delete
              val deleted = readFilesMinusDv(spark, root, st, dataSchema,
                group.map(_._1))
                .filter(col(column) >= lo && col(column) <= hi)
                .withColumn(ChangeTypeCol, lit("delete"))
              writeCdcFile(deleted, root, pv, st)
            }
        }(sideJobEc))
      // ONE rewrite job over every touched file (a file that keeps zero
      // rows simply never appears — pure remove). A DV-carrying file
      // rewrites its LIVE survivors and the new add drops the DV.
      val rewritten = rewriteFilesBatched(spark, root, exactTouched.map(_._1),
        dataSchema, _.filter(!matches || col(column).isNull),
        "graft-delta-del", st, touchedDvs)
      exactTouched.foreach { case (rel, pv) =>
        actions += removeActionNode(rel, true); touched += 1
        rewritten.get(rel).foreach { part =>
          // a shallow-cloned (absolute) source file rewrites into
          // THIS table's root — never beside the source
          val full = resolvePath(root, rel)
          val targetDir =
            if (rel.startsWith("/")) Paths.get(root) else full.getParent
          val target = targetDir.resolve(part.getFileName)
          Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
          val newRel = Paths.get(root).relativize(target).toString
            .replace(java.io.File.separatorChar, '/')
          actions += addActionNode(root, newRel, pv, dataChange = true, conf)
        }
      }
      cdcFut.foreach(f => actions ++= Await.result(f, Duration.Inf))
    }
    if (touched == 0) return v
    writeCommitFile(root, v + 1, actions.result(), operation = "DELETE")
    postCommit(spark, root, st, v + 1)
    v + 1
  }

  /** DELETE via DELETION VECTORS — the modern Delta write path
    * (PROTOCOL.md table feature `deletionVectors`; what Delta 3.x DML
    * does by default): instead of rewriting every touched file, the
    * matching ROW POSITIONS are recorded in a roaring bitmap stored in
    * a `deletion_vector_<uuid>.bin` sidecar, and each touched file is
    * re-added with the DV descriptor attached. IO is matching-rows
    * metadata, never a data rewrite — on a 100 TB table a small DELETE
    * touches kilobytes where copy-on-write rewrites gigabytes. Files
    * that already carry a DV get the new positions MERGED in (one
    * descriptor per file, always the union). The commit upgrades the
    * table protocol to 3/7 + `deletionVectors` the first time a DV
    * lands, exactly as Delta's own writer does. File skipping applies
    * as in [[deleteWhereLong]]; no-op (no commit) when nothing new
    * matches. Returns the table version afterwards.
    *
    * Positions per file are collected to the driver bitmap-sized (the
    * same shape Delta's writer materializes); the scan that finds them
    * is predicate-pushed and reads only stat-overlapping files.
    */
  def deleteWhereLongDV(spark: SparkSession, root: String, column: String,
                        lo: Long, hi: Long): Long = {
    import spark.implicits._
    require(lo <= hi, s"DeltaLog.deleteWhereLongDV: empty interval [$lo, $hi]")
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritableMapping(st, "deleteWhereLongDV")
    requireNotAppendOnly(st, "deleteWhereLongDV")
    requireWritable(st, "deleteWhereLongDV")
    require(!st.configuration.get("delta.symlinkFormatManifest.enabled")
      .exists(_.trim.equalsIgnoreCase("true")),
      "DeltaLog.deleteWhereLongDV: the table auto-generates symlink " +
        "manifests, and whole-file manifest readers would resurrect " +
        "DV-deleted rows — use the copy-on-write deleteWhereLong, or " +
        "unset delta.symlinkFormatManifest.enabled first")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val pcSet = st.partitionColumns.toSet
    require(!pcSet(column),
      "DeltaLog.deleteWhereLongDV: partition-column deletes are pure " +
        "metadata — use deleteWhereLong")
    val dataSchema = StructType(schema.filterNot(f => pcSet(f.name)))
    val conf = spark.sparkContext.hadoopConfiguration
    val overlapping = st.files
      .filter { case (p, _) => statsOverlap(st, p, column, lo, hi) }
    val actions = Seq.newBuilder[JsonNode]
    var touched = 0
    val dvUuid = java.util.UUID.randomUUID()
    val dvFile = Paths.get(root, Dv.dvFileName(dvUuid))
    val pathOrInline = Dv.z85Encode(Dv.uuidBytes(dvUuid))
    val matches = col(column) >= lo && col(column) <= hi
    // name-mode mapping: the scan reads PHYSICAL fields and the
    // predicate rebinds to the physical column name
    val (physSchema, physMap) = readSchemaFor(st, dataSchema)
    val physCol = physMap.getOrElse(column, column)
    val matchesPhys = col(physCol) >= lo && col(physCol) <= hi
    // Matched positions per file are built EXECUTOR-side into the
    // serialized portable bitmap by ONE aggregation job: the driver
    // receives bitmap BYTES per file, never row positions — driver
    // memory ∝ bitmap size, not deleted-row count. Basename tagging as
    // in the batched rewrites, with a per-file fallback on collision.
    val matchedBytes: Map[String, Array[Byte]] = {
      if (overlapping.isEmpty) Map.empty
      else {
        val bitmapAgg = org.apache.spark.sql.functions.udaf(
          BitmapAgg, org.apache.spark.sql.Encoders.scalaLong)
        chooseTagging(root, overlapping.map(_._1)) match {
          case Some(tagging) =>
            val tagToRel = overlapping.map(c =>
              tagging.tagOf(c._1) -> c._1).toMap
            spark.read.schema(physSchema)
              .parquet(overlapping.map(c =>
                resolvePath(root, c._1).toString): _*)
              .filter(matchesPhys)
              .select(tagging.tagExpr.as("__name"),
                col("_metadata.row_index").as("__pos"))
              .groupBy(col("__name")).agg(bitmapAgg(col("__pos")).as("__dv"))
              .collect()
              .map(r => tagToRel(r.getString(0)) -> r.getAs[Array[Byte]](1))
              .toMap
          case None => overlapping.flatMap { case (rel, _) =>
            spark.read.schema(physSchema)
              .parquet(resolvePath(root, rel).toString)
              .filter(matchesPhys)
              .select(col("_metadata.row_index").as("__pos"))
              .agg(bitmapAgg(col("__pos")).as("__dv"))
              .collect().headOption.filterNot(_.isNullAt(0))
              .map(r => rel -> r.getAs[Array[Byte]](0))
          }.toMap
        }
      }
    }
    val cdcDel =
      Seq.newBuilder[(Map[String, String], String, Option[Dv.PositionSet])]
    overlapping.foreach { case (rel, pv) =>
      matchedBytes.get(rel).foreach { bytes =>
        val matchedPs = Dv.deserialize(bytes)
        val existing = st.fileDvs.get(rel).map(_.read(root))
        val union = existing
          .map(e => Dv.union(e, matchedPs)).getOrElse(matchedPs)
        // fresh rows exist iff the union grew past the existing DV
        if (union.cardinality >
            existing.map(_.cardinality).getOrElse(0L)) {
          cdcDel += ((pv, rel, existing))
          val (offset, size) = Dv.appendBlob(dvFile, Dv.serialize(union))
          val desc = DvDescriptor("u", pathOrInline, Some(offset), size,
            union.cardinality)
          actions += removeActionNode(rel, dataChange = true)
          actions += addActionNode(root, rel, pv, dataChange = true, conf,
            dv = Some(desc))
          touched += 1
        }
      }
    }
    if (touched == 0) return v
    // CDF: a DV delete is invisible to add/remove synthesis (the data
    // file is re-added byte-identical), so the freshly deleted rows
    // MUST land in a CDC file — the predicate re-finds them; rows the
    // file's PRIOR DV had already deleted are excluded by position
    // (broadcast bounded by the prior DV's cardinality, usually zero).
    if (cdfEnabled(st)) {
      cdcDel.result().groupBy(_._1).toSeq.sortBy(_._1.mkString(" "))
        .foreach { case (pv, group) =>
          val deleted = group.map { case (_, rel, existing) =>
            // mapped-aware scan: physical names in, logical out
            val base = spark.read.schema(physSchema)
              .parquet(resolvePath(root, rel).toString)
            existing match {
              case None =>
                base.filter(matchesPhys)
                  .select(dataSchema.fields.map(f =>
                    toLogicalField(f, physMap.getOrElse(f.name, f.name)))
                    .toIndexedSeq: _*)
              case Some(e) =>
                val posDf = org.apache.spark.sql.functions.broadcast(
                  e.positions.toSeq.toDF("__graft_pos"))
                base.filter(matchesPhys)
                  .select(Seq(col("_metadata.row_index").as("__graft_pos")) ++
                    dataSchema.fields.map(f =>
                      toLogicalField(f, physMap.getOrElse(f.name, f.name))): _*)
                  .join(posDf, Seq("__graft_pos"), "left_anti")
                  .drop("__graft_pos")
            }
          }.reduce(_ unionByName _)
            .withColumn(ChangeTypeCol, lit("delete"))
          actions += writeCdcFile(deleted, root, pv, st)
        }
    }
    // first DV on this table: upgrade the protocol the way Delta does
    val hasDvFeature = st.minReaderVersion >= 3 &&
      st.readerFeatures.contains("deletionVectors")
    val protocolUpgrade =
      if (hasDvFeature) Seq.empty[JsonNode]
      else {
        val n = mapper.createObjectNode()
        val p = n.putObject("protocol")
        p.put("minReaderVersion", 3)
        p.put("minWriterVersion", 7)
        val rf = p.putArray("readerFeatures")
        (st.readerFeatures :+ "deletionVectors").distinct.foreach(rf.add)
        // a legacy minWriterVersion implies features version 7 must
        // ENUMERATE — dropping them here would let a feature-gated
        // external writer stop honoring e.g. changeDataFeed
        val wf = p.putArray("writerFeatures")
        (legacyWriterFeatures(st.minWriterVersion) ++ st.writerFeatures :+
          "deletionVectors").distinct.foreach(wf.add)
        Seq[JsonNode](n)
      }
    writeCommitFile(root, v + 1, protocolUpgrade ++ actions.result(),
      operation = "DELETE")
    postCommit(spark, root, st, v + 1)
    v + 1
  }

  /** Copy-on-write UPDATE: rows with `column` in [lo, hi] get the `set`
    * expressions applied (other rows pass through bit-identical);
    * committed as `remove`+`add` with `dataChange=true`. File skipping
    * as in [[deleteWhereLong]]: only stat-overlapping files rewrite.
    * `set` columns must be data columns (partition values are identity
    * — an UPDATE that moves rows across partitions is a delete+insert,
    * out of scope here); each expression is cast back to the declared
    * type so the schema cannot drift. No-op when nothing overlaps.
    */
  def updateWhereLong(spark: SparkSession, root: String, column: String,
                      lo: Long, hi: Long,
                      set: Map[String, org.apache.spark.sql.Column]): Long = {
    require(lo <= hi, s"DeltaLog.updateWhereLong: empty interval [$lo, $hi]")
    require(set.nonEmpty, "DeltaLog.updateWhereLong: empty SET")
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritableMapping(st, "updateWhereLong")
    requireNotAppendOnly(st, "updateWhereLong")
    requireWritable(st, "updateWhereLong")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val pcSet = st.partitionColumns.toSet
    require(!pcSet(column) && set.keySet.forall(!pcSet(_)),
      "DeltaLog.updateWhereLong: partition columns cannot be predicated " +
        "or SET (cross-partition moves are delete+insert)")
    val dataSchema = StructType(schema.filterNot(f => pcSet(f.name)))
    set.keySet.foreach(k => require(dataSchema.fieldNames.contains(k),
      s"DeltaLog.updateWhereLong: SET column $k not in data schema"))
    // generated columns cannot be SET; they RECOMPUTE after the SET
    // expressions (Delta's UPDATE semantics), appended to the ordered
    // assignment list so they see post-SET values
    val gens = generationExprs(dataSchema)
    gens.foreach { case (c, _) => require(!set.contains(c),
      s"DeltaLog.updateWhereLong: $c is GENERATED ALWAYS — it " +
        "recomputes from its expression, it cannot be SET") }
    val assignments = set.toSeq.sortBy(_._1) ++
      gens.map { case (c, g) => c -> expr(g) }
    val conf = spark.sparkContext.hadoopConfiguration
    val overlapping = st.files
      .filter { case (p, _) => statsOverlap(st, p, column, lo, hi) }
    if (overlapping.isEmpty) return v
    val matches = col(column) >= lo && col(column) <= hi
    // stats overlap ≠ rows match: rewriting an unmatched file would
    // poison later readAppendsSince tails for a change that changed
    // nothing. ONE probe job over the predicate column, not a limit-1
    // probe per candidate file.
    val candDvs = overlapping
      .flatMap(f => st.fileDvs.get(f._1).map(f._1 -> _)).toMap
    val exactTouched = probeTouched(spark, root, overlapping,
      StructType(Seq(dataSchema(column))), _.filter(matches), st,
      candDvs)
    if (exactTouched.isEmpty) return v
    val touchedDvs = candDvs.filter(d => exactTouched.exists(_._1 == d._1))
    val actions = Seq.newBuilder[JsonNode]
    // CDF: matched rows before and after the SET — the only record of
    // WHICH rows changed (the remove+add pair is file-grain); one
    // multi-file scan per touched partition. Postimage from the MATCHED
    // source rows, not the rewritten file: a SET that rewrites the
    // predicate column itself would make the new file unfilterable.
    // Pre and post images come from ONE scan: originals are staged
    // under __graft_pre_* aliases, the ordered assignments fold on top
    // (generated columns must see post-SET values), and a row-doubling
    // explode emits both images — half the touched-file IO of the
    // previous pre ∪ post two-leg union. The cdc write reads only
    // PRE-rewrite files and writes only under _change_data, so it is
    // independent of the rewrite job and launched to OVERLAP it (FIFO
    // back-fill); an orphaned cdc file from a failed rewrite is never
    // referenced by any commit and falls to vacuum.
    val cdcFut: Option[Future[Seq[JsonNode]]] =
      if (!cdfEnabled(st)) None
      else Some(Future {
        import org.apache.spark.sql.functions.{array, explode, struct}
        exactTouched.groupBy(_._2).toSeq.sortBy(_._1.mkString(" "))
          .map { case (pv, group) =>
            // live rows only: prior-DV-deleted rows are not updated
            val matched = readFilesMinusDv(spark, root, st, dataSchema,
              group.map(_._1)).filter(matches)
            val staged = dataSchema.fieldNames.foldLeft(matched)(
              (d, c) => d.withColumn(s"__graft_pre_$c", col(c)))
            val folded = assignments.foldLeft(staged) { case (df, (c, e)) =>
              df.withColumn(c, e.cast(dataSchema(c).dataType))
            }
            val both = folded.select(explode(array(
                struct(dataSchema.fieldNames.toSeq
                  .map(c => col(s"__graft_pre_$c").as(c)) :+
                  lit("update_preimage").as(ChangeTypeCol): _*),
                struct(dataSchema.fieldNames.toSeq.map(c => col(c)) :+
                  lit("update_postimage").as(ChangeTypeCol): _*)))
                .as("__graft_chg"))
              .select((dataSchema.fieldNames.toSeq :+ ChangeTypeCol)
                .map(f => col(s"__graft_chg.$f")): _*)
            writeCdcFile(both, root, pv, st)
          }
      }(sideJobEc))
    // ONE rewrite job over every touched file; an UPDATE keeps every
    // LIVE row, so each touched rel must come back. A DV-carrying file
    // rewrites its live rows and the new add drops the DV.
    val rewritten = rewriteFilesBatched(spark, root, exactTouched.map(_._1),
      dataSchema,
      source => enforceInvariants(
        assignments.foldLeft(source) { case (df, (c, e)) =>
          df.withColumn(c,
            org.apache.spark.sql.functions.when(matches, e)
              .otherwise(col(c)).cast(dataSchema(c).dataType))
        }, dataSchema, st.configuration),
      "graft-delta-upd", st, touchedDvs)
    exactTouched.foreach { case (rel, pv) =>
      val part = rewritten.getOrElse(rel, throw new IllegalStateException(
        s"DeltaLog.updateWhereLong: rewrite of $rel produced no rows — " +
          "an UPDATE must keep every row"))
      val full = resolvePath(root, rel)
      val targetDir =
        if (rel.startsWith("/")) Paths.get(root) else full.getParent
      val target = targetDir.resolve(part.getFileName)
      Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
      val newRel = Paths.get(root).relativize(target).toString
        .replace(java.io.File.separatorChar, '/')
      actions += removeActionNode(rel, true)
      actions += addActionNode(root, newRel, pv, dataChange = true, conf)
    }
    cdcFut.foreach(f => actions ++= Await.result(f, Duration.Inf))
    writeCommitFile(root, v + 1, actions.result(), operation = "UPDATE")
    postCommit(spark, root, st, v + 1)
    v + 1
  }

  /** Copy-on-write MERGE — Delta's `MERGE INTO` in its most common
    * shape (the reference's upsert: match on a key, update every
    * column, insert the rest; analytics/spark/jobs/silver_orders.py
    * merges on STRING `order_id` into an `event_date`-partitioned
    * silver table — exactly this): every source row whose `key`
    * matches a target row REPLACES that row whole, source rows with no
    * match INSERT. One commit: each touched target file rewrites
    * WITHOUT its matched rows (`remove`+`add`, staying in its
    * partition directory), the full source lands as target-sized new
    * files routed by partition value — so target = (target ∖ matched)
    * ∪ source, cross-partition moves fall out naturally (the old row
    * leaves its file, the new row lands where its own partition values
    * say), and untouched files are never rewritten.
    *
    * File-skipping BEFORE the exact one-job semi-join probe: integral,
    * date, decimal and string keys all prune candidates by footer-stats
    * range (a point-key merge into a sorted 100 TB table touches one
    * file), integral/date/string additionally by footer blooms; other
    * key types degrade gracefully to probing every active file — the
    * probe scan reads the key column only and still narrows the rewrite
    * to the exactly-touched set.
    *
    * Contracts, all loud: source must cover the full table schema
    * including partition columns (extra columns refused — silent drops
    * hide writer bugs); non-null source keys must be UNIQUE (Delta's
    * multiple-source-rows-match error); NULL source keys never match
    * and always insert; the key must be a data column (partition-key
    * merges are metadata games this writer doesn't play). Touched
    * files carrying deletion vectors rewrite their LIVE rows and the
    * new add CLEARS the DV; column-mapped tables (name and id modes)
    * resolve at the IO boundary. When CDF is on, matched rows land in
    * per-partition
    * `cdc` files as `update_preimage` (in the OLD row's partition) /
    * `update_postimage` and `insert` (in the SOURCE row's partition);
    * a pure-insert merge commits adds only and the feed synthesizes
    * its inserts like any append. No-op (no commit) on an empty
    * source. Returns the table version afterwards.
    */
  /** Candidate file set of a [[mergeKey]] probe — stacked METADATA-ONLY
    * pruning so a point upsert into a 100 TB table opens only files
    * that can hold a matching key:
    * (1) footer-stats RANGE prune: numeric min/max for INTEGRAL keys
    *     (long/int/short/byte — int stats are JSON numbers like long
    *     stats), ISO-string min/max for DATE keys
    *     ([[statsOverlapDate]]), exact BigDecimal min/max for DECIMAL
    *     keys ([[statsOverlapDec]]), lexicographic min/max for STRING
    *     keys (external writers truncate string stats, but truncated
    *     bounds stay ENCLOSING — [[statsOverlapStr]] — so pruning is
    *     exact; guarded to ASCII bounds where every ordering in play
    *     agrees);
    * (2) footer BLOOM exact-negative point prune when the source key
    *     set is enumerable ([[mergeBloomMaxKeys]]) and the key type is
    *     [[bloomProbeable]] (integral/date keys hash by the file's OWN
    *     physical INT32/INT64 form, strings as UTF-8 binary): on an
    *     UNSORTED key stats prune nothing — the bloom is what keeps a
    *     point merge from scanning the whole table. Files [[mergeKey]]
    *     itself wrote carry a key bloom by construction; files without
    *     one are conservatively kept.
    * Other key types skip both layers (the exact semi-join probe then
    * reads the key column of every active file). IO here is footer
    * bytes ∝ candidate count, never data pages.
    */
  private[lake] def mergeCandidates(spark: SparkSession, root: String,
      st: LogState, key: String, srcKeys: DataFrame,
      srcRows: Long): Seq[(String, Map[String, String])] = {
    import org.apache.spark.sql.functions.{min => fmin, max => fmax}
    val conf = spark.sparkContext.hadoopConfiguration
    val keyType = st.schema.map(_.apply(key).dataType).getOrElse(NullType)
    val ranged: Seq[(String, Map[String, String])] = keyType match {
      case LongType | IntegerType | ShortType | ByteType =>
        // ALL integral keys prune through the numeric stats range —
        // int/short/byte stats are JSON numbers like long stats, and
        // the reference's own dimension keys are ints (an int surrogate
        // key must not degrade to a full-table probe)
        val kr = srcKeys
          .agg(fmin(col(key).cast(LongType)), fmax(col(key).cast(LongType)))
          .head()
        if (kr.isNullAt(0)) Nil // all-NULL keys: pure insert
        else st.files.filter { case (rel, _) =>
          statsOverlap(st, rel, key, kr.getLong(0), kr.getLong(1)) }
      case DateType =>
        // date stats render as ISO strings in Delta stats JSON;
        // ISO order == date order (see [[statsOverlapDate]])
        val kr = srcKeys.agg(fmin(col(key)), fmax(col(key))).head()
        if (kr.isNullAt(0)) Nil
        else st.files.filter { case (rel, _) =>
          statsOverlapDate(st, rel, key,
            kr.getDate(0).toLocalDate.toString,
            kr.getDate(1).toLocalDate.toString) }
      case _: DecimalType =>
        // decimal stats are JSON numbers — exact BigDecimal compare
        val kr = srcKeys.agg(fmin(col(key)), fmax(col(key))).head()
        if (kr.isNullAt(0)) Nil
        else st.files.filter { case (rel, _) =>
          statsOverlapDec(st, rel, key, kr.getDecimal(0), kr.getDecimal(1)) }
      case StringType =>
        val kr = srcKeys.agg(fmin(col(key)), fmax(col(key))).head()
        if (kr.isNullAt(0)) Nil
        else {
          val (lo, hi) = (kr.getString(0), kr.getString(1))
          // Spark's min/max order strings by UTF-8 bytes; for ASCII
          // bounds that coincides with the stats comparison's order
          if (lo.forall(_ < 0x80) && hi.forall(_ < 0x80))
            st.files.filter { case (rel, _) =>
              statsOverlapStr(st, rel, key, lo, hi) }
          else st.files
        }
      case _ => if (srcKeys.isEmpty) Nil else st.files
    }
    if (!bloomProbeable(keyType) || ranged.isEmpty ||
        srcRows > mergeBloomMaxKeys) ranged
    else {
      // srcRows bounds the key count, so this collect is point/batch
      // sized by the gate above — never a bulk upsert's key set
      val keys = srcKeys.collect().map(r => normalizeBloomKey(r.get(0)))
      val physKey = statsKeyOf(st, key)
      val fid = fieldIdOf(st, key)
      ranged.filter { case (rel, _) =>
        bloomKeepsFile(resolvePath(root, rel), physKey, fid, keys, conf) }
    }
  }

  /** Key types the footer-bloom point layer can probe (and the
    * merge-written key bloom is worth recording for): integral and
    * date keys hash through the file's own INT32/INT64 physical form,
    * strings as UTF-8 binary. Decimals are excluded — their physical
    * encoding varies by precision (INT32/INT64/FIXED_LEN_BYTE_ARRAY)
    * across writers, so a probe hash is not reliably comparable.
    */
  private def bloomProbeable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType |
         StringType => true
    case _ => false
  }

  /** Collected driver value of a probeable key → the [[bloomKeepsFile]]
    * probe form: every integral (and date, as epoch days — parquet's
    * own DATE representation) normalizes to java.lang.Long; the probe
    * re-narrows by the FILE's physical type.
    */
  private def normalizeBloomKey(v: Any): Any = v match {
    case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
    case s: java.lang.Short => java.lang.Long.valueOf(s.longValue())
    case b: java.lang.Byte => java.lang.Long.valueOf(b.longValue())
    case d: java.sql.Date => java.lang.Long.valueOf(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => java.lang.Long.valueOf(d.toEpochDay)
    case other => other
  }

  /** Test seam: the pruned candidate rel set a [[mergeKey]] of `source`
    * on `key` would probe — metadata-only, no DML performed.
    */
  private[lake] def mergeCandidateRels(spark: SparkSession, root: String,
      key: String, source: DataFrame): Seq[String] = {
    val st = replay(spark, root, currentVersion(root))
    val srcKeys = source.filter(col(key).isNotNull).select(col(key))
    mergeCandidates(spark, root, st, key, srcKeys, source.count())
      .map(_._1)
  }

  def mergeKey(spark: SparkSession, root: String, key: String,
               source: DataFrame): Long = {
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritableMapping(st, "mergeKey")
    requireWritable(st, "mergeKey")
    val fullSchema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val pcs = st.partitionColumns
    val pcSet = pcs.toSet
    require(fullSchema.fieldNames.contains(key),
      s"DeltaLog.mergeKey: key $key not in schema")
    require(!pcSet(key),
      s"DeltaLog.mergeKey: key $key is a partition column — match on a " +
        "data column (partition-grain replacement is overwrite territory)")
    val dataSchema = StructType(fullSchema.filterNot(f => pcSet(f.name)))
    // generated columns: computed when the source lacks them,
    // verified inline when it provides them
    val sourceG = applyGeneratedColumns(source, fullSchema)
    val missing = fullSchema.fieldNames.filterNot(sourceG.columns.contains)
    require(missing.isEmpty,
      s"DeltaLog.mergeKey: source lacks columns ${missing.mkString(", ")}")
    val extra = sourceG.columns.filterNot(fullSchema.fieldNames.contains)
    require(extra.isEmpty,
      s"DeltaLog.mergeKey: source carries extra columns " +
        s"${extra.mkString(", ")} the target schema cannot hold")
    val src = sourceG.select(fullSchema.fields
      .map(f => col(f.name).cast(f.dataType)).toSeq: _*).persist()
    try {
      // ONE pre-flight job over the persisted source replaces three
      // materializations (the isEmpty probe, the dup-key guard's
      // grouped count, and the row count): total rows = Σ of per-key
      // counts (the NULL-key group included), dup guard = the max
      // multiplicity among non-null keys. srcRows feeds BOTH the
      // insert-file binning below and the bloom-prune enumerability
      // gate.
      val srcStats = src.groupBy(col(key)).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c")).as("__n"),
          max(when(col(key).isNotNull, col("__c"))).as("__dup")).head()
      val srcRows = if (srcStats.isNullAt(0)) 0L else srcStats.getLong(0)
      if (srcRows == 0L) return v
      require(srcStats.isNullAt(1) || srcStats.getLong(1) <= 1L,
        "DeltaLog.mergeKey: multiple source rows share a key — " +
          "which one updates the matched target row is undefined")
      val srcKeys = src.filter(col(key).isNotNull).select(col(key))
      val conf = spark.sparkContext.hadoopConfiguration
      val candidates = mergeCandidates(spark, root, st, key, srcKeys,
        srcRows)
      val physMap = physicalWriteMap(st, fullSchema)
      // every file a merge writes carries a BLOOM on the merge key
      // (adaptive sizing: parquet picks the smallest candidate filter
      // covering the file's actual NDV), so the NEXT point merge or
      // readWhere*Point prunes this table's own upsert traffic without
      // relying on external writers to have indexed the key. Only for
      // key types the prune layers can actually probe (~0.2-0.4 s
      // local fixed cost per merge, bought back at the first point
      // upsert into the written files).
      val keyBloomOpts =
        if (bloomProbeable(fullSchema(key).dataType))
          bloomOptions(Seq(physMap.getOrElse(key, key))) +
            ("parquet.bloom.filter.adaptive.enabled" -> "true")
        else Map.empty[String, String]
      val candDvs = candidates
        .flatMap(f => st.fileDvs.get(f._1).map(f._1 -> _)).toMap
      // exact touched set by ONE semi-join probe job over the
      // candidates' key columns only
      val touched = probeTouched(spark, root, candidates,
        StructType(Seq(dataSchema(key))),
        _.join(srcKeys, Seq(key), "left_semi"), st, candDvs)
        .sortBy(_._1)
      val touchedDvs = candDvs.filter(d => touched.exists(_._1 == d._1))
      val actions = Seq.newBuilder[JsonNode]
      // an append-only table allows the pure-insert merge (nothing
      // matched); any matched row would rewrite history
      if (touched.nonEmpty) requireNotAppendOnly(st, "mergeKey")
      // CDF: the remove+add pairs are file-grain — only cdc files
      // record WHICH rows updated vs inserted. Matched keys are read
      // back from the touched source files (on disk until vacuum).
      // Pre-images live in the OLD row's partition; postimages and
      // inserts in the SOURCE row's own partition. The cdc write reads
      // only PRE-rewrite files plus the persisted source and writes
      // only under _change_data — independent of both the rewrite and
      // the insert job, so it is launched here to OVERLAP them (FIFO
      // back-fill); an orphaned cdc file from a failed rewrite is never
      // referenced by any commit and falls to vacuum.
      val cdcFut: Option[Future[Seq[JsonNode]]] =
        if (!(cdfEnabled(st) && touched.nonEmpty)) None
        else Some(Future {
          // live rows only: keys whose target rows were all DV-deleted
          // are inserts, not updates
          val touchedRows = readFilesMinusDv(spark, root, st, dataSchema,
            touched.map(_._1))
          val matchedKeys = touchedRows.select(col(key))
            .join(srcKeys, Seq(key), "left_semi").distinct().persist()
          def inOrder(df: DataFrame) =
            df.select(dataSchema.fieldNames.map(col).toSeq: _*)
          try {
            if (pcs.isEmpty) {
              val pre = inOrder(touchedRows
                .join(srcKeys, Seq(key), "left_semi"))
                .withColumn(ChangeTypeCol, lit("update_preimage"))
              val post = inOrder(src.join(matchedKeys, Seq(key),
                "left_semi"))
                .withColumn(ChangeTypeCol, lit("update_postimage"))
              val ins = inOrder(src.join(matchedKeys, Seq(key),
                "left_anti"))
                .withColumn(ChangeTypeCol, lit("insert"))
              Seq(writeCdcFile(
                pre.unionByName(post).unionByName(ins), root, Map.empty,
                st))
            } else {
              // PARTITIONED change capture in ONE dynamic-partitioned
              // write: pre-images get their FILE's partition values from
              // Spark's own basePath partition discovery (data files
              // don't store partition columns; basename tags can COLLIDE
              // across partition dirs of one write, so no tag joins);
              // DV'd or clone-absolute files take a per-file branch with
              // pv literals. Post-images and inserts carry the source
              // row's own values. Jobs stay O(1), never O(partitions).
              val (special, plain) = touched.partition { case (rel, _) =>
                rel.startsWith("/") || st.fileDvs.contains(rel) }
              // data fields resolve like every other mapped read —
              // readSchemaFor stamps parquet.field.id in id mode, where a
              // file's stored names may legally differ from the declared
              // physicalName (a hand-renamed physFull would read such
              // files as all-NULL pre-images); partition fields append
              // PHYSICAL-named for basePath directory discovery
              val physFull = StructType(readSchemaFor(st, dataSchema)._1.fields
                ++ fullSchema.fields.filter(f => pcSet(f.name)).map(f =>
                  f.copy(name = physMap.getOrElse(f.name, f.name))))
              def logicalAll = fullSchema.fields.map(f =>
                toLogicalField(f, physMap.getOrElse(f.name, f.name)))
              val preParts = Seq.newBuilder[DataFrame]
              if (plain.nonEmpty)
                preParts += spark.read.option("basePath", root)
                  .schema(physFull)
                  .parquet(plain.map(p =>
                    resolvePath(root, p._1).toString): _*)
                  .select(logicalAll.toIndexedSeq: _*)
              special.foreach { case (rel, pv) =>
                val base = readFilesMinusDv(spark, root, st, dataSchema,
                  Seq(rel))
                preParts += fullSchema.fields.filter(f => pcSet(f.name))
                  .foldLeft(base) { (d, f) =>
                    val k2 = pvKeyOf(st, fullSchema, f.name, pv).getOrElse(
                      throw new IllegalArgumentException(
                        s"DeltaLog.mergeKey: $rel lacks partitionValues " +
                          s"for declared partition column ${f.name}"))
                    d.withColumn(f.name, Option(pv(k2)) match {
                      case Some(s) => lit(s).cast(f.dataType)
                      case None => lit(null).cast(f.dataType)
                    })
                  }
                  .select(fullSchema.fieldNames.map(col).toSeq: _*)
              }
              def inOrderFull(df: DataFrame) =
                df.select(fullSchema.fieldNames.map(col).toSeq: _*)
              val pre = inOrderFull(preParts.result()
                .reduce(_ unionByName _)
                .join(srcKeys, Seq(key), "left_semi"))
                .withColumn(ChangeTypeCol, lit("update_preimage"))
              val post = inOrderFull(src.join(matchedKeys, Seq(key),
                "left_semi"))
                .withColumn(ChangeTypeCol, lit("update_postimage"))
              val ins = inOrderFull(src.join(matchedKeys, Seq(key),
                "left_anti"))
                .withColumn(ChangeTypeCol, lit("insert"))
              writeCdcFilesPartitioned(
                pre.unionByName(post).unionByName(ins), root, pcs, st)
            }
          } finally matchedKeys.unpersist()
        }(sideJobEc))
      // ONE rewrite job drops the matched rows from every touched file
      // (a file that loses all its rows becomes a pure remove); each
      // rewrite stays in its source file's partition directory. A
      // DV-carrying file rewrites its LIVE rows and the add drops the DV.
      val rewritten = rewriteFilesBatched(spark, root, touched.map(_._1),
        dataSchema, _.join(srcKeys, Seq(key), "left_anti"),
        "graft-delta-merge", st, touchedDvs, keyBloomOpts)
      touched.foreach { case (rel, pv) =>
        actions += removeActionNode(rel, dataChange = true)
        rewritten.get(rel).foreach { part =>
          // a shallow-cloned (absolute) source file rewrites into THIS
          // table's root — never beside the source
          val full = resolvePath(root, rel)
          val targetDir =
            if (rel.startsWith("/")) Paths.get(root) else full.getParent
          val target = targetDir.resolve(part.getFileName)
          Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
          val newRel = Paths.get(root).relativize(target).toString
            .replace(java.io.File.separatorChar, '/')
          actions += addActionNode(root, newRel, pv, dataChange = true,
            conf)
        }
      }
      // the whole source — updated versions of matched rows plus the
      // genuinely new ones — lands as target-sized files in ONE job
      // (a bulk upsert batch must not serialize through one task)
      val insFiles = math.max(1L, (srcRows + mergeInsertRowsPerFile - 1) /
        mergeInsertRowsPerFile).toInt
      // insert files store PHYSICAL names on a mapped table (identity
      // rename otherwise); partition directories and partitionValues
      // key by the physical partition-column name
      val insDf = toPhysicalDf(st, fullSchema,
        enforceInvariants(src, fullSchema, st.configuration))
      val physPcs = pcs.map(c => physMap.getOrElse(c, c))
      if (pcs.isEmpty) {
        val insParts =
          if (insFiles == 1) // point merge: coalesce, no shuffle
            Seq(writeSingleParquet(insDf, root, "graft-delta-merge",
              keyBloomOpts))
          else writeParquetFiles(insDf, root, "graft-delta-merge", insFiles,
            keyBloomOpts)
        insParts.foreach { insPart =>
          val insTarget = Paths.get(root).resolve(insPart.getFileName)
          Files.move(insPart, insTarget, StandardCopyOption.ATOMIC_MOVE)
          actions += addActionNode(root,
            insTarget.getFileName.toString, Map.empty, dataChange = true,
            conf)
        }
      } else {
        // dynamic-partitioned insert, ONE job: partition cols + a
        // key-hash salt spread a bulk batch across tasks without
        // serializing a hot partition through one of them
        val staging = Files.createTempDirectory(stagingBase(root),
          "graft-delta-merge")
        insDf
          .repartition(insFiles, physPcs.map(col) :+
            pmod(hash(col(physMap.getOrElse(key, key))), lit(insFiles)): _*)
          .write.options(keyBloomOpts).mode("overwrite")
          .partitionBy(physPcs: _*)
          .parquet(staging.toString)
        val walk = Files.walk(staging)
        val dataFiles =
          try walk.iterator().asScala
            .filter(p => Files.isRegularFile(p)
              && p.getFileName.toString.endsWith(".parquet"))
            .toSeq.sortBy(_.toString)
          finally walk.close()
        dataFiles.foreach { p =>
          val rel = staging.relativize(p).toString
            .replace(java.io.File.separatorChar, '/')
          val target = Paths.get(root, rel)
          Files.createDirectories(target.getParent)
          Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
          actions += addActionNode(root, rel,
            partitionValuesOf(rel, physPcs), dataChange = true, conf)
        }
        deleteRecursively(staging)
      }
      cdcFut.foreach(f => actions ++= Await.result(f, Duration.Inf))
      writeCommitFile(root, v + 1, actions.result(), operation = "MERGE")
      postCommit(spark, root, st, v + 1)
      v + 1
    } finally src.unpersist()
  }

  /** Backwards-compatible name for [[mergeKey]] from when the merge
    * was limited to flat tables with a LONG key; the generalized
    * implementation accepts any data-column key type and partitioned
    * targets, so this simply delegates.
    */
  def mergeLongKey(spark: SparkSession, root: String, key: String,
                   source: DataFrame): Long =
    mergeKey(spark, root, key, source)

  /** Rows APPENDED after `sinceVersion` — the incremental-ETL tail
    * read a downstream job consumes between runs. Semantics mirror the
    * Delta streaming source: the JSON commits of the tail are walked
    * directly; `add`s with `dataChange=true` contribute their rows,
    * whole `dataChange=false` commits (OPTIMIZE compaction) are
    * SKIPPED — the rewritten rows were already consumed from their
    * original files, which remain readable until vacuum — and a
    * `remove` with `dataChange=true` in the tail (DML/rewrite) FAILS
    * LOUDLY: changed history must flow through a CDC surface, an
    * append tail cannot represent it. The tail's JSON commits must be
    * present (a checkpoint compacts STATE, not the append history).
    */
  def readAppendsSince(spark: SparkSession, root: String,
                       sinceVersion: Long): DataFrame = {
    val cur = currentVersion(root)
    val st = replay(spark, root, cur)
    assembleFiles(spark, root, st,
      appendedFilesIn(root, sinceVersion, cur).map(a => (a._2, a._3)))
  }

  /** The (version, relPath, partitionValues) of every data file
    * APPENDED in `(sinceVersion, toVersion]` — the file-grain tail walk
    * [[readAppendsSince]] and the streaming source share. Same loud
    * contracts: tail commits must be present, `dataChange=false`
    * commits (OPTIMIZE) skip, DV attachments and `dataChange=true`
    * removes refuse (changed history needs the CDC surface).
    */
  private[graft] def appendedFilesIn(root: String, sinceVersion: Long,
      toVersion: Long): Seq[(Long, String, Map[String, String], Long)] = {
    val present = versions(root).toSet
    ((sinceVersion + 1) to toVersion).foreach(v =>
      require(present.contains(v),
        s"DeltaLog.appendedFilesIn: commit $v missing from $root — the " +
          "append tail needs its JSON commits (checkpoints compact " +
          "state, not history)"))
    val adds = Seq.newBuilder[(Long, String, Map[String, String], Long)]
    ((sinceVersion + 1) to toVersion).foreach { v =>
      val lines = Files.readAllLines(logDir(root).resolve(commitName(v)))
        .asScala.filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("add")) {
          val a = node.get("add")
          if (a.path("dataChange").asBoolean(true)) {
            // the DV refusal applies only to dataChange adds: an
            // external OPTIMIZE that rewrites with dataChange=false
            // while RETAINING DV descriptors is a layout-only no-op for
            // an append tail and must skip like any other compaction
            require(!a.path("deletionVector").isObject,
              s"DeltaLog.appendedFilesIn: commit $v of $root attaches a " +
                "deletion vector (DELETE via DV) — an append tail cannot " +
                "represent changed history; consume CDC instead")
            val pvNode = a.path("partitionValues")
            val pv =
              if (pvNode.isObject)
                pvNode.properties().asScala
                  .map(e => e.getKey ->
                    (if (e.getValue.isNull) null else e.getValue.asText()))
                  .toMap
              else Map.empty[String, String]
            adds += ((v, decodePath(a.path("path").asText()), pv,
              a.path("size").asLong(0L)))
          }
        } else if (node.has("remove")) {
          require(!node.get("remove").path("dataChange").asBoolean(true),
            s"DeltaLog.appendedFilesIn: commit $v of $root removes data " +
              "with dataChange=true (DELETE/UPDATE/rewrite) — an append " +
              "tail cannot represent changed history; consume CDC instead")
        }
      }
    }
    adds.result()
  }

  /** The table's column-mapping mode ("none" when unset) — external
    * integrations that read data files DIRECTLY (the streaming source)
    * must resolve the mapping themselves (see [[columnResolution]]) or
    * they would read physical-named files through logical names as
    * all-NULL columns.
    */
  def columnMappingMode(spark: SparkSession, root: String): String =
    mappingMode(replay(spark, root, currentVersion(root)))

  /** Direct-file-reader column resolution: (logical → physical name,
    * logical → parquet field id) per the table's mapping mode — both
    * empty when unmapped. Name mode resolves by physical name; id mode
    * resolves by the footer's field ids with the physical name as the
    * fallback lookup.
    */
  def columnResolution(spark: SparkSession,
      root: String): (Map[String, String], Map[String, Long]) = {
    val st = replay(spark, root, currentVersion(root))
    st.schema match {
      case None => (Map.empty, Map.empty)
      case Some(schema) => mappingMode(st) match {
        case "name" => (physicalTopLevel(schema), Map.empty)
        case "id" =>
          (physicalTopLevel(schema),
            schema.fields.collect {
              case f if f.metadata.contains(ColumnIdKey) =>
                f.name -> f.metadata.getLong(ColumnIdKey)
            }.toMap)
        case _ => (Map.empty, Map.empty)
      }
    }
  }

  /** Whether the table currently declares change-data-feed capture. */
  def changeFeedEnabled(spark: SparkSession, root: String): Boolean =
    cdfEnabled(replay(spark, root, currentVersion(root)))

  /** File-grain CHANGE FEED walk of `(sinceVersion, toVersion]` for the
    * streaming source: per file `(version, rel, partitionValues,
    * changeTypeConstant)` — `None` when the file is a `cdc` file that
    * CARRIES its own `_change_type` column, `Some("insert")` for a
    * synthesized pure-append commit. A commit that removes data with
    * `dataChange=true` and no cdc files refuses loudly (this writer
    * always records cdc for DML on CDF tables; external whole-file
    * deletes belong to the batch [[readChangeFeed]], which can
    * synthesize them).
    */
  private[graft] def changeFilesIn(root: String, sinceVersion: Long,
      toVersion: Long): Seq[(Long, String, Map[String, String], Option[String], Long)] = {
    val present = versions(root).toSet
    ((sinceVersion + 1) to toVersion).foreach(v =>
      require(present.contains(v),
        s"DeltaLog.changeFilesIn: commit $v missing from $root — the " +
          "feed tail needs its JSON commits"))
    val out = Seq.newBuilder[(Long, String, Map[String, String], Option[String], Long)]
    ((sinceVersion + 1) to toVersion).foreach { v =>
      val cdcs = Seq.newBuilder[(String, Map[String, String], Long)]
      val adds = Seq.newBuilder[(String, Map[String, String], Long)]
      var removesData = false
      Files.readAllLines(logDir(root).resolve(commitName(v))).asScala
        .filter(_.trim.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          def pvOf(n: JsonNode): Map[String, String] = {
            val pvNode = n.path("partitionValues")
            if (pvNode.isObject)
              pvNode.properties().asScala.map(e => e.getKey ->
                (if (e.getValue.isNull) null else e.getValue.asText())).toMap
            else Map.empty[String, String]
          }
          if (node.has("cdc")) {
            val c = node.get("cdc")
            cdcs += ((decodePath(c.path("path").asText()), pvOf(c),
              c.path("size").asLong(0L)))
          } else if (node.has("add")) {
            val a = node.get("add")
            if (a.path("dataChange").asBoolean(true))
              adds += ((decodePath(a.path("path").asText()), pvOf(a),
                a.path("size").asLong(0L)))
          } else if (node.has("remove")) {
            if (node.get("remove").path("dataChange").asBoolean(true))
              removesData = true
          }
        }
      val cdcFiles = cdcs.result()
      if (cdcFiles.nonEmpty)
        cdcFiles.foreach { case (rel, pv, sz) =>
          out += ((v, rel, pv, None, sz)) }
      else {
        require(!removesData,
          s"DeltaLog.changeFilesIn: commit $v of $root removes data " +
            "without cdc files — the stream cannot represent it; use " +
            "the batch readChangeFeed")
        adds.result().foreach { case (rel, pv, sz) =>
          out += ((v, rel, pv, Some("insert"), sz))
        }
      }
    }
    out.result()
  }

  /** The declared schema and partition columns of the CURRENT version —
    * the metadata surface external integrations (the streaming source)
    * open a table with.
    */
  def tableMeta(spark: SparkSession, root: String): (StructType, Seq[String]) = {
    val st = replay(spark, root, currentVersion(root))
    (st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown")),
      st.partitionColumns)
  }

  /** The CHANGE DATA FEED of versions `(sinceVersion, toVersion]` —
    * every row-level change with `_change_type` (`insert` / `delete` /
    * `update_preimage` / `update_postimage`), `_commit_version` and
    * `_commit_timestamp` appended to the data columns; Delta's own CDF
    * read surface (PROTOCOL.md: Add CDC File). Per commit: when `cdc`
    * actions are present they ARE the feed for that version
    * (add/remove ignored, the protocol's rule); otherwise changes are
    * SYNTHESIZED — `add dataChange=true` rows as inserts, each
    * `remove dataChange=true` file's rows as deletes (whole-file
    * deletes and blind appends, the cases Delta itself derives).
    * Refused loudly: tables without `delta.enableChangeDataFeed`, DV
    * commits lacking CDC files (the byte-identical re-add makes
    * synthesis blind to them), removed files that carried a DV (their
    * dead rows would resurrect), and vacuumed-away removed files.
    *
    * Scale posture: driver work is one JSON parse per tail commit
    * (tails are incremental-ETL-sized); row IO is distributed scans of
    * exactly the CDC/changed files. `toVersion < 0` means the current
    * version.
    */
  def readChangeFeed(spark: SparkSession, root: String,
                     sinceVersion: Long, toVersion: Long = -1L): DataFrame = {
    val cur = currentVersion(root)
    val to = if (toVersion < 0L) cur else toVersion
    require(sinceVersion <= to && to <= cur,
      s"DeltaLog.readChangeFeed: bad version range ($sinceVersion, $to] " +
        s"on a table at version $cur")
    val st = replay(spark, root, cur)
    require(cdfEnabled(st),
      s"DeltaLog.readChangeFeed: $root does not set " +
        "delta.enableChangeDataFeed=true — no change feed was recorded")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    val pcSet = st.partitionColumns.toSet
    val dataSchema = StructType(schema.filterNot(f => pcSet(f.name)))
    val present = versions(root).toSet
    ((sinceVersion + 1) to to).foreach(v => require(present.contains(v),
      s"DeltaLog.readChangeFeed: commit $v missing from $root — the " +
        "change feed needs its JSON commits (checkpoints compact state, " +
        "not history)"))
    def pvOf(n: JsonNode): Map[String, String] = {
      val pvNode = n.path("partitionValues")
      if (!pvNode.isObject) Map.empty
      else pvNode.properties().asScala
        .map(e => e.getKey ->
          (if (e.getValue.isNull) null else e.getValue.asText())).toMap
    }
    def attachPv(df: DataFrame, pv: Map[String, String],
                 rel: String): DataFrame =
      schema.fields.foldLeft(df) { (d, f) =>
        if (!pcSet(f.name)) d
        else {
          val key = pvKeyOf(st, schema, f.name, pv).getOrElse(
            throw new IllegalArgumentException(
              s"DeltaLog.readChangeFeed: $rel lacks partitionValues " +
                s"for declared partition column ${f.name}"))
          d.withColumn(f.name, Option(pv(key)) match {
            case Some(s) => lit(s).cast(f.dataType)
            case None => lit(null).cast(f.dataType)
          })
        }
      }
    val outCols = schema.fieldNames.toSeq :+ ChangeTypeCol
    val perVersion = ((sinceVersion + 1) to to).flatMap { v =>
      val lines = Files.readAllLines(logDir(root).resolve(commitName(v)))
        .asScala.filter(_.trim.nonEmpty)
      val cdcs = Seq.newBuilder[(String, Map[String, String])]
      val adds = Seq.newBuilder[(String, Map[String, String])]
      val removes = Seq.newBuilder[String]
      var dvAdds = 0
      lines.foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("cdc")) {
          val c = node.get("cdc")
          cdcs += decodePath(c.path("path").asText()) -> pvOf(c)
        } else if (node.has("add")) {
          val a = node.get("add")
          if (a.path("dataChange").asBoolean(true)) {
            if (a.path("deletionVector").isObject) dvAdds += 1
            adds += decodePath(a.path("path").asText()) -> pvOf(a)
          }
        } else if (node.has("remove")) {
          val r = node.get("remove")
          if (r.path("dataChange").asBoolean(true))
            removes += decodePath(r.path("path").asText())
        }
      }
      val (cdcList, addList, removeList) =
        (cdcs.result(), adds.result(), removes.result())
      val changes: Option[DataFrame] =
        if (cdcList.nonEmpty) {
          // mapped tables: cdc data columns store physical names /
          // field ids; `_change_type` is a feed artifact, never mapped
          val (scanData, _) = readSchemaFor(st, dataSchema)
          val cdcSchema = StructType(scanData.fields :+
            StructField(ChangeTypeCol, StringType, nullable = true))
          Some(cdcList.map { case (rel, pv) =>
            attachPv(spark.read.schema(cdcSchema)
              .parquet(resolvePath(root, rel).toString)
              .toDF((dataSchema.fieldNames :+ ChangeTypeCol).toSeq: _*),
              pv, rel)
              .select(outCols.map(col): _*)
          }.reduce(_ unionByName _))
        } else if (addList.isEmpty && removeList.isEmpty) None
        else {
          require(dvAdds == 0,
            s"DeltaLog.readChangeFeed: commit $v of $root attaches a " +
              "deletion vector without CDC files — row-level changes " +
              "were not recorded and cannot be synthesized")
          val inserted =
            if (addList.isEmpty) None
            else {
              addList.foreach { case (rel, _) =>
                require(Files.exists(resolvePath(root, rel)),
                  s"DeltaLog.readChangeFeed: added file $rel of commit " +
                    s"$v was vacuumed away — this change-feed range is " +
                    "no longer readable")
              }
              // the files carried no DV AT v (checked above); strip any
              // DV a LATER version attached so the insert reads the full
              // file as committed
              Some(assembleFiles(spark, root,
                st.copy(fileDvs = st.fileDvs -- addList.map(_._1)), addList)
                .withColumn(ChangeTypeCol, lit("insert")))
            }
          val deleted =
            if (removeList.isEmpty) None
            else {
              val prev = replay(spark, root, v - 1)
              val prevFiles = prev.files.toMap
              val rfiles = removeList.map { rel =>
                require(prevFiles.contains(rel),
                  s"DeltaLog.readChangeFeed: remove $rel at commit $v " +
                    s"was not active at ${v - 1}")
                require(!prev.fileDvs.contains(rel),
                  s"DeltaLog.readChangeFeed: removed file $rel carried " +
                    "a deletion vector — whole-file synthesis would " +
                    "resurrect its dead rows; the writer should have " +
                    "recorded CDC files")
                require(Files.exists(resolvePath(root, rel)),
                  s"DeltaLog.readChangeFeed: removed file $rel was " +
                    "vacuumed away — this change-feed range is no " +
                    "longer readable")
                rel -> prevFiles(rel)
              }
              Some(assembleFiles(spark, root, prev, rfiles)
                .withColumn(ChangeTypeCol, lit("delete")))
            }
          Some((inserted.toSeq ++ deleted.toSeq).reduce(_ unionByName _))
        }
      changes.map(_
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          lit(new java.sql.Timestamp(commitTimestamp(root, v))))
        .select((outCols ++ Seq("_commit_version", "_commit_timestamp"))
          .map(col): _*))
    }
    if (perVersion.isEmpty) {
      val outSchema = StructType(schema.fields ++ Seq(
        StructField(ChangeTypeCol, StringType, nullable = true),
        StructField("_commit_version", LongType, nullable = false),
        StructField("_commit_timestamp", TimestampType, nullable = false)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    } else perVersion.reduce(_ unionByName _)
  }

  /** RESTORE the table to the snapshot of an earlier `version` (Delta's
    * `RESTORE TABLE … TO VERSION AS OF`): ONE new commit whose actions
    * make the current active set equal the target's — files active then
    * but not now are re-added (with their recorded partition values,
    * stats and DV descriptor), files active now but not then are
    * removed, and a file whose DV CHANGED in between is re-added with
    * the target descriptor. History is never rewritten — the restore is
    * itself a commit, so the pre-restore state stays time-travelable.
    * Refuses loudly when a file (or DV sidecar) the target needs was
    * vacuumed away. Restoring PAST a schema/partitioning/property
    * change re-emits the target version's metaData in the restore
    * commit. Metadata-only: no data IO at any scale. Returns the new
    * version (or the current one when already identical).
    */
  def restore(spark: SparkSession, root: String, version: Long): Long = {
    val cur = currentVersion(root)
    require(version >= 0L && version <= cur,
      s"DeltaLog.restore: version $version outside [0, $cur] of $root")
    val target = replay(spark, root, version)
    val current = replay(spark, root, cur)
    // restore moves LOG entries only (no column IO), so mapped tables
    // (name AND id mode) restore fine
    requireWritableMapping(current, "restore")
    requireNotAppendOnly(current, "restore")
    requireWritable(current, "restore")
    // restoring PAST a schema change (mergeSchema evolution, ALTER,
    // property change) reinstates the target version's metaData in the
    // restore commit — the protocol permits re-emitting metaData at
    // any commit, and readers at cur+1 then see exactly the restored
    // snapshot's schema/partitioning/configuration. History replays:
    // the evolution commits stay addressable below cur+1.
    val needMeta = target.schema != current.schema ||
      target.partitionColumns != current.partitionColumns ||
      target.configuration != current.configuration
    val curFiles = current.files.toMap
    val tgtFiles = target.files.toMap
    def dvOf(st: LogState, rel: String): Option[DvDescriptor] =
      st.fileDvs.get(rel)
    val toAdd = target.files.filter { case (rel, _) =>
      !curFiles.contains(rel) || dvOf(current, rel) != dvOf(target, rel)
    }
    val toRemove = current.files.collect {
      case (rel, _) if !tgtFiles.contains(rel) => rel
    } ++ toAdd.collect {
      case (rel, _) if curFiles.contains(rel) => rel
    }
    if (toAdd.isEmpty && toRemove.isEmpty && !needMeta) return cur
    toAdd.foreach { case (rel, _) =>
      require(Files.exists(resolvePath(root, rel)),
        s"DeltaLog.restore: $rel of version $version was vacuumed " +
          "away — that snapshot is no longer restorable")
      dvOf(target, rel).filter(_.storageType == "u").foreach { d =>
        val sidecar = d.sidecarRel
        require(Files.exists(Paths.get(root, sidecar)),
          s"DeltaLog.restore: DV sidecar $sidecar of version $version " +
            "was vacuumed away — that snapshot is no longer restorable")
      }
    }
    val actions = Seq.newBuilder[JsonNode]
    if (needMeta)
      actions += metaDataAction(current.tableId,
        target.schema.getOrElse(throw new IllegalStateException(
          s"DeltaLog.restore: version $version has no metaData")).json,
        target.partitionColumns, target.configuration)
    toRemove.distinct.foreach(rel =>
      actions += removeActionNode(rel, dataChange = true))
    toAdd.foreach { case (rel, pv) =>
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", encodePath(rel))
      val pvo = a.putObject("partitionValues")
      pv.foreach { case (k, sv) =>
        if (sv == null) pvo.putNull(k) else pvo.put(k, sv)
      }
      a.put("size", target.fileSizes.getOrElse(rel,
        Files.size(resolvePath(root, rel))))
      a.put("modificationTime", target.fileModTimes.getOrElse(rel,
        Files.getLastModifiedTime(resolvePath(root, rel)).toMillis))
      a.put("dataChange", true)
      target.fileStats.get(rel).foreach(a.put("stats", _))
      dvOf(target, rel).foreach { d =>
        val o = a.putObject("deletionVector")
        o.put("storageType", d.storageType)
        o.put("pathOrInlineDv", d.pathOrInlineDv)
        d.offset.foreach(o.put("offset", _))
        o.put("sizeInBytes", d.sizeInBytes)
        o.put("cardinality", d.cardinality)
      }
      actions += n
    }
    // the POST-restore configuration (= the target's: needMeta re-emits
    // it; !needMeta means it already equals the current one) governs
    // post-commit maintenance. Refuse BEFORE the commit lands when it
    // declares auto-manifests but the restored snapshot carries DVs —
    // otherwise the durable restore would be followed by the manifest
    // regeneration throwing, leaving on-disk manifests stale at the
    // pre-restore snapshot (mirrors the deleteWhereLongDV guard).
    val restoredDvs = target.files.count(f => target.fileDvs.contains(f._1))
    if (manifestEnabled(target.configuration))
      require(restoredDvs == 0,
        s"DeltaLog.restore: $restoredDvs file(s) of version $version " +
          "carry deletion vectors and the restored configuration " +
          "declares delta.symlinkFormatManifest.enabled — symlink " +
          "readers would resurrect their deleted rows; unset the " +
          "property or restore to a DV-free version")
    writeCommitFile(root, cur + 1, actions.result(),
      operation = "RESTORE")
    // a restore that FLIPS the property on reinstates auto-manifests
    // over a tree that went stale (or missing) while it was off — the
    // incremental touched-set below only covers this commit's files,
    // so regenerate fully first (mirrors the setTableProperties
    // enable path)
    if (manifestEnabled(target.configuration) &&
        !manifestEnabled(current.configuration))
      regenerateManifests(spark, root, None)
    // …and a restore that flips it OFF must not leave the pre-restore
    // tree behind: with maintenance now following the restored
    // configuration, nothing would ever update it again — external
    // readers would silently keep the pre-restore snapshot and then
    // dangle once vacuum collects those files. Absence is loud;
    // staleness is not.
    if (!manifestEnabled(target.configuration) &&
        manifestEnabled(current.configuration)) {
      val tree = Paths.get(root).toAbsolutePath.normalize()
        .resolve("_symlink_format_manifest")
      if (Files.isDirectory(tree)) deleteRecursively(tree)
    }
    postCommit(spark, root,
      current.copy(configuration = target.configuration), cur + 1)
    cur + 1
  }

  /** SHALLOW CLONE (Delta's `CREATE TABLE … SHALLOW CLONE src`): a new
    * table whose commit 0 re-declares the source's protocol, schema,
    * partitioning and configuration, and whose adds reference the
    * source's CURRENT active files by ABSOLUTE path (PROTOCOL.md
    * allows absolute `path` fields — this is what they exist for).
    * Zero data copied at any scale; recorded stats/partition values/DV
    * descriptors carry over (DV sidecars re-addressed as absolute
    * `p`-storage so they keep resolving to the source's blobs).
    * The clone then evolves INDEPENDENTLY: copy-on-write DML rewrites
    * land under the clone's root, the source never mutates; the
    * clone's vacuum walks only its own root, so source files are never
    * collected. Returns the clone's version 0.
    */
  def shallowClone(spark: SparkSession, sourceRoot: String,
                   targetRoot: String, version: Long = -1L): Long = {
    require(!Files.isDirectory(logDir(targetRoot)),
      s"DeltaLog.shallowClone: $targetRoot already has a _delta_log")
    // `CLONE src VERSION AS OF v`: the clone's commit 0 is the
    // source's state AT that version (−1 = current) — time travel
    // materialized as a new table, still zero data copies
    val srcCur = currentVersion(sourceRoot)
    require(version <= srcCur,
      s"DeltaLog.shallowClone: version $version does not exist in " +
        s"$sourceRoot (current is $srcCur)")
    val st = replay(spark, sourceRoot,
      if (version < 0L) srcCur else version)
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $sourceRoot log — schema unknown"))
    // a clone's adds are ABSOLUTE references into the source — the
    // auto-manifest property it would inherit can never regenerate
    // under the clone's root (no table-relative partition directory),
    // so the clone's FIRST data commit would throw AFTER its durable
    // write. Refuse here, before anything lands (mirrors the restore
    // guard); clone without the property and re-enable it once the
    // clone's files are its own (compact).
    require(!manifestEnabled(st.configuration),
      s"DeltaLog.shallowClone: $sourceRoot declares " +
        "delta.symlinkFormatManifest.enabled — a clone's " +
        "absolute-path adds cannot regenerate manifests; unset the " +
        "property on the source (or clone a version without it) and " +
        "re-enable on the clone after compacting")
    val srcAbs = Paths.get(sourceRoot).toAbsolutePath.normalize()
    val actions = Seq.newBuilder[JsonNode]
    val protocol = mapper.createObjectNode()
    val p = protocol.putObject("protocol")
    p.put("minReaderVersion", st.minReaderVersion)
    p.put("minWriterVersion", st.minWriterVersion)
    if (st.readerFeatures.nonEmpty) {
      val rf = p.putArray("readerFeatures"); st.readerFeatures.foreach(rf.add)
    }
    if (st.writerFeatures.nonEmpty) {
      val wf = p.putArray("writerFeatures"); st.writerFeatures.foreach(wf.add)
    }
    actions += protocol
    val tableId = java.util.UUID.nameUUIDFromBytes(
      ("graft-delta:" + targetRoot).getBytes("UTF-8")).toString
    actions += metaDataAction(tableId, schema.json, st.partitionColumns,
      st.configuration)
    st.files.foreach { case (rel, pv) =>
      val abs =
        if (rel.startsWith("/")) rel // cloning a clone: already absolute
        else srcAbs.resolve(rel).toString
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", encodePath(abs))
      val pvo = a.putObject("partitionValues")
      pv.foreach { case (k, sv) =>
        if (sv == null) pvo.putNull(k) else pvo.put(k, sv)
      }
      a.put("size", st.fileSizes.getOrElse(rel, Files.size(Paths.get(abs))))
      a.put("modificationTime", st.fileModTimes.getOrElse(rel, 0L))
      a.put("dataChange", true)
      st.fileStats.get(rel).foreach(a.put("stats", _))
      st.fileDvs.get(rel).foreach { d =>
        val o = a.putObject("deletionVector")
        d.storageType match {
          case "u" =>
            // re-address the source-relative sidecar absolutely
            o.put("storageType", "p")
            o.put("pathOrInlineDv", srcAbs.resolve(d.sidecarRel).toString)
          case _ =>
            o.put("storageType", d.storageType)
            o.put("pathOrInlineDv", d.pathOrInlineDv)
        }
        d.offset.foreach(o.put("offset", _))
        o.put("sizeInBytes", d.sizeInBytes)
        o.put("cardinality", d.cardinality)
      }
      actions += n
    }
    Files.createDirectories(logDir(targetRoot))
    // a clone of an ICT table starts its own monotonic chain — the
    // carried configuration says timestamps are in-commit, so its
    // commits must actually have them
    writeCommitFile(targetRoot, 0L, actions.result(), operation = "CLONE",
      ictStart = st.configuration.get("delta.enableInCommitTimestamps")
        .exists(_.trim.equalsIgnoreCase("true")))
    0L
  }

  /** `CLONE src TIMESTAMP AS OF ts` — [[shallowClone]] at the version
    * [[versionAsOf]] resolves (latest commit at or before `tsMillis`,
    * ICT-aware).
    */
  def shallowCloneAsOf(spark: SparkSession, sourceRoot: String,
                       targetRoot: String, tsMillis: Long): Long =
    shallowClone(spark, sourceRoot, targetRoot,
      versionAsOf(sourceRoot, tsMillis))

  /** `GENERATE symlink_format_manifest` — the Presto / Athena /
    * legacy-Hive interop surface delta.io documents: one `manifest`
    * text file per partition directory under
    * `_symlink_format_manifest/`, each line the ABSOLUTE path of an
    * active data file of that partition (flat tables write the single
    * root manifest). The whole tree regenerates per call — manifests
    * of partitions the current snapshot no longer holds are removed,
    * so a stale reader never resurrects a dropped partition. Refused
    * while any active file carries a deletion vector: a symlink
    * reader sees whole files and would resurrect the deleted rows
    * (compact the DVs away first). Returns the written manifest paths
    * relative to the table root.
    */
  def generateSymlinkManifest(spark: SparkSession,
                              root: String): Seq[String] =
    regenerateManifests(spark, root, None)

  /** Partition directories (the path above the file name; `""` for a
    * flat table's root) the add/remove set of commit `v` touches — the
    * incremental manifest-regeneration unit. Reads ONE commit JSON:
    * O(commit), never O(table).
    */
  private def touchedPartitionDirs(root: String, v: Long): Set[String] =
    Files.readAllLines(logDir(root).resolve(commitName(v))).asScala
      .filter(_.trim.nonEmpty).flatMap { line =>
        val n = mapper.readTree(line)
        val p =
          if (n.has("add")) Some(n.get("add").path("path").asText())
          else if (n.has("remove")) Some(n.get("remove").path("path").asText())
          else None
        p.map(decodePath)
      }.map { rel =>
        val slash = rel.lastIndexOf('/')
        if (slash < 0) "" else rel.substring(0, slash)
      }.toSet

  /** Manifest (re)generation over a bounded set of partition
    * directories: `touched = Some(dirs)` rewrites exactly those
    * partitions' manifests (the [[postCommit]] incremental path — a
    * single-partition append on a 10k-partition table rewrites ONE
    * manifest, not 10k); `None` is the full sweep ([[generateSymlink
    * Manifest]]), covering every active partition plus every manifest
    * already on disk so vanished partitions are cleaned. Each manifest
    * is replaced IN PLACE via tmp + atomic rename — external readers
    * never see a missing or torn manifest (the old whole-tree
    * delete+rewrite exposed a manifest-less window every commit).
    * Vanished partitions lose their manifest and any now-empty parent
    * directories. Refuses DV-bearing snapshots (whole-file readers
    * would resurrect deleted rows) and absolute-path actives (a
    * shallow clone's borrowed files have no table-relative partition
    * directory — materialize them first).
    */
  private def regenerateManifests(spark: SparkSession, root: String,
                                  touched: Option[Set[String]]): Seq[String] = {
    val st = replay(spark, root, currentVersion(root))
    val dvd = st.files.map(_._1).filter(st.fileDvs.contains)
    require(dvd.isEmpty,
      s"DeltaLog.generateSymlinkManifest: ${dvd.size} active file(s) " +
        "carry deletion vectors — a symlink reader would resurrect " +
        "their deleted rows; rewrite them first (compact/OPTIMIZE)")
    val abs = st.files.filter(_._1.startsWith("/"))
    require(abs.isEmpty,
      s"DeltaLog.generateSymlinkManifest: ${abs.size} active file(s) " +
        "are absolute-path references (a shallow clone) — they have " +
        "no partition directory under this root; compact the clone " +
        "into its own files first")
    val rootAbs = Paths.get(root).toAbsolutePath.normalize()
    val base = rootAbs.resolve("_symlink_format_manifest")
    // group active files by their partition DIRECTORY (everything
    // above the file name; flat tables group under "")
    val byDir: Map[String, Seq[String]] = st.files.map { case (rel, _) =>
      val slash = rel.lastIndexOf('/')
      val dir = if (slash < 0) "" else rel.substring(0, slash)
      dir -> resolvePath(root, rel).toAbsolutePath.normalize().toString
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val consider: Set[String] = touched match {
      // a touched set against a manifest tree that does not exist yet
      // (property enabled before any manifests were generated) must
      // fall back to the full sweep or untouched partitions would
      // never get manifests
      case Some(dirs) if Files.isDirectory(base) => dirs
      case _ =>
        val onDisk: Set[String] =
          if (!Files.isDirectory(base)) Set.empty
          else {
            val w = Files.walk(base)
            try w.iterator().asScala
              .filter(p => Files.isRegularFile(p) &&
                p.getFileName.toString == "manifest")
              .map(p => base.relativize(p.getParent).toString
                .replace(java.io.File.separatorChar, '/'))
              .toSet
            finally w.close()
          }
        byDir.keySet ++ onDisk
    }
    consider.toSeq.sorted.flatMap { dir =>
      val outDir = if (dir.isEmpty) base else base.resolve(dir)
      byDir.get(dir) match {
        case Some(entries) =>
          Files.createDirectories(outDir)
          val body = entries.sorted.mkString("", "\n", "\n")
          // UUID-suffixed tmp: two post-commit regenerations of the
          // same partition (concurrent appends) must not share one
          // staging name — the loser's delete would strand the winner
          val tmp = outDir.resolve(
            s"manifest.__tmp-${java.util.UUID.randomUUID()}")
          Files.write(tmp, body.getBytes("UTF-8"))
          Files.move(tmp, outDir.resolve("manifest"),
            StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
          Some(if (dir.isEmpty) "_symlink_format_manifest/manifest"
          else s"_symlink_format_manifest/$dir/manifest")
        case None =>
          Files.deleteIfExists(outDir.resolve("manifest"))
          var d = outDir
          while (d != null && d != base && Files.isDirectory(d) && {
            val s = Files.list(d)
            try !s.iterator().hasNext finally s.close()
          }) { Files.delete(d); d = d.getParent }
          None
      }
    }
  }

  /** Physically delete data files the CURRENT version no longer
    * references — Delta's VACUUM. The retention window comes from the
    * table's declared `delta.deletedFileRetentionDuration` (an
    * `interval N <unit>` string, Delta's own property); a table that
    * declares none collects with ZERO retention here (the dev-friendly
    * local form — Delta's managed default is `interval 1 week`, which
    * deployments that want the grace period should declare on the
    * table). Refuses tables that also carry a graft [[Snapshots]]
    * `_log` (their manifests reference history files this walk cannot
    * see; vacuum those through [[Snapshots.vacuum]]). Returns the
    * deleted table-relative paths.
    */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val st = replay(spark, root, currentVersion(root))
    vacuum(spark, root,
      st.configuration.get("delta.deletedFileRetentionDuration")
        .map(parseIntervalMs).getOrElse(0L))
  }

  /** Delta duration property (`interval N week|day|hour|minute|second|
    * millisecond[s]`) → milliseconds; loud on anything else.
    */
  private[lake] def parseIntervalMs(s: String): Long = {
    val Re = """(?i)\s*interval\s+(\d+)\s+(\w+?)s?\s*""".r
    s match {
      case Re(n, unit) =>
        val per = unit.toLowerCase match {
          case "week" => 7L * 86400000L
          case "day" => 86400000L
          case "hour" => 3600000L
          case "minute" => 60000L
          case "second" => 1000L
          case "millisecond" => 1L
          case other => throw new IllegalArgumentException(
            s"DeltaLog: unsupported interval unit '$other' in '$s'")
        }
        n.toLong * per
      case _ => throw new IllegalArgumentException(
        s"DeltaLog: cannot parse duration '$s' (expected " +
          "'interval N <unit>')")
    }
  }

  /** [[vacuum]] with an EXPLICIT retention window: a no-longer-active
    * file survives this pass while its REMOVAL is newer than
    * `retentionMs` — eligibility is judged by the newest
    * `remove.deletionTimestamp` the retained JSON commits record for
    * it (Delta's own rule: a long-lived file deleted a second ago must
    * survive, which its write-time mtime cannot express), so
    * time-travel reads of versions removed INSIDE the window keep
    * working and concurrent readers of recent versions stay alive.
    * Files the retained log never mentions (crash leftovers, or
    * removes compacted away behind a checkpoint) fall back to the
    * modification-time test. Zero retention is the full collect.
    */
  /** `VACUUM ... DRY RUN` — the paths a [[vacuum]] at `retentionMs`
    * WOULD delete, deleting nothing (what an operator reads before
    * committing to an irreversible reclaim).
    */
  def vacuumDryRun(spark: SparkSession, root: String,
                   retentionMs: Long = 0L): Seq[String] =
    vacuumImpl(spark, root, retentionMs, delete = false)

  def vacuum(spark: SparkSession, root: String,
             retentionMs: Long): Seq[String] =
    vacuumImpl(spark, root, retentionMs, delete = true)

  /** Directory counts above which [[vacuumImpl]] ships its listing /
    * its deletes to executors instead of walking serially on the
    * driver — at 100×-scale file counts the single-threaded walk and
    * orphan-by-orphan delete loop ARE the vacuum bottleneck, while a
    * flat gate fixture (zero subdirectories, a handful of orphans)
    * never pays a Spark job for what one readdir answers.
    */
  private val VacuumDistributeDirs = 8
  private val VacuumDistributeDeletes = 64

  /** Vacuum candidate: a data/DV file's table-relative path plus the
    * mtime captured DURING listing (one stat, reused by the retention
    * fallback instead of a second driver-side stat per file).
    */
  private def vacuumListDir(fs: org.apache.hadoop.fs.FileSystem,
                            rootPrefix: String,
                            dir: org.apache.hadoop.fs.Path): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile) {
        val name = s.getPath.getName
        val rel = s.getPath.toUri.getPath.stripPrefix(rootPrefix)
        if ((name.endsWith(".parquet") ||
          (name.startsWith("deletion_vector_") && name.endsWith(".bin"))) &&
          // dot-prefixed segments are writer scratch, never table
          // data — .graft_staging holds in-flight parquet between an
          // executor write and the driver's commit-time move; a
          // concurrent zero-retention vacuum collecting them would
          // make that move fail (mirrors convertToDelta's listing)
          !rel.split('/').exists(_.startsWith(".")))
          out += ((rel, s.getModificationTime))
      }
    }
    out.result()
  }

  private def vacuumImpl(spark: SparkSession, root: String,
                         retentionMs: Long, delete: Boolean): Seq[String] = {
    require(retentionMs >= 0L, s"DeltaLog.vacuum: retentionMs >= 0")
    require(!Files.isDirectory(Paths.get(root, "_log")),
      s"DeltaLog.vacuum: $root is a graft Snapshots table — vacuum " +
        "through Snapshots.vacuum so manifests stay readable")
    val st = replay(spark, root, currentVersion(root))
    val active = st.files.map(_._1).toSet
    // DV sidecars referenced by an ACTIVE descriptor stay; the rest are
    // history (an old DV superseded by a merge, or of a removed file)
    val activeDvFiles: Set[String] = st.fileDvs.values.collect {
      case d if d.storageType == "u" => d.sidecarRel
    }.toSet
    val rootPath = Paths.get(root).toAbsolutePath.normalize()
    val rootPrefix = rootPath.toString + "/"
    val hadoopProps: Array[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val driverFs = new org.apache.hadoop.fs.Path(rootPath.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // top level on the driver (one readdir): depth-1 files list
    // directly; each subdirectory is an independent walk unit — the
    // _delta_log / _change_data / dot-scratch exclusions are whole
    // top-level trees, so pruning them here skips the walk entirely
    // (CDC files are never snapshot-active; deleting them would
    // silently destroy the change feed — CDF retention is its own
    // policy, not vacuum's)
    val top = driverFs.listStatus(
      new org.apache.hadoop.fs.Path(rootPath.toString)).toSeq
    val excludedTop = Set("_delta_log", "_change_data")
    val dirUnits = top.filter(s => s.isDirectory &&
      !excludedTop(s.getPath.getName) && !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    val rootFiles: Seq[(String, Long)] = top.filter { s =>
      val name = s.getPath.getName
      s.isFile && !name.startsWith(".") &&
        (name.endsWith(".parquet") ||
          (name.startsWith("deletion_vector_") && name.endsWith(".bin")))
    }.map(s => (s.getPath.getName, s.getModificationTime))
    val dirFiles: Seq[(String, Long)] =
      if (dirUnits.size <= VacuumDistributeDirs)
        dirUnits.flatMap(d => vacuumListDir(driverFs, rootPrefix, d))
      else {
        // many partition directories: one walk unit per directory,
        // shipped to executors with the session's resolved hadoop conf
        // (the countFast idiom — a bare Configuration in the task
        // would lose FS settings)
        val confBc = spark.sparkContext.broadcast(hadoopProps)
        val prefix = rootPrefix
        spark.sparkContext
          .parallelize(dirUnits.map(_.toString),
            math.min(dirUnits.size, spark.sparkContext.defaultParallelism))
          .mapPartitions { dirs =>
            val conf = new org.apache.hadoop.conf.Configuration(false)
            confBc.value.foreach { case (k, v) => conf.set(k, v) }
            dirs.flatMap { d =>
              val p = new org.apache.hadoop.fs.Path(d)
              vacuumListDir(p.getFileSystem(conf), prefix, p).iterator
            }
          }.collect().toSeq
      }
    val onDiskTimed: Seq[(String, Long)] = rootFiles ++ dirFiles
    val onDisk = onDiskTimed.map(_._1)
    val mtimes: Map[String, Long] = onDiskTimed.toMap
    val cutoff = System.currentTimeMillis() - retentionMs
    // newest recorded removal time per file, from the retained JSON
    // tail (one driver-side parse per commit — tails are
    // incremental-ETL-sized; removes compacted behind a checkpoint
    // fall back to mtime below)
    lazy val removalTimes: Map[String, Long] =
      if (retentionMs == 0L) Map.empty
      else versions(root).flatMap { v =>
        Files.readAllLines(logDir(root).resolve(commitName(v))).asScala
          .filter(_.trim.nonEmpty).flatMap { line =>
            val n = mapper.readTree(line)
            if (!n.has("remove")) None
            else {
              val r = n.get("remove")
              val ts = r.path("deletionTimestamp")
              // a remove without a timestamp contributes nothing — the
              // file then falls back to the mtime test like unknowns
              if (ts.isNumber)
                Some(decodePath(r.path("path").asText()) -> ts.asLong())
              else None
            }
          }
      }.groupMapReduce(_._1)(_._2)(math.max)
    val orphans = onDisk.filterNot(rel =>
      active(rel) || activeDvFiles(rel))
      .filter(rel => retentionMs == 0L ||
        removalTimes.getOrElse(rel,
          mtimes.getOrElse(rel,
            Files.getLastModifiedTime(Paths.get(root, rel)).toMillis))
          <= cutoff)
    if (delete) {
      if (orphans.size <= VacuumDistributeDeletes)
        orphans.foreach(rel => Files.delete(Paths.get(root, rel)))
      else {
        // large reclaims ship the deletes to executors too — the
        // orphan-by-orphan driver loop is the other serial half of
        // the 100×-scale bottleneck; a false return (vanished /
        // undeletable file) fails the task loudly like Files.delete
        val confBc = spark.sparkContext.broadcast(hadoopProps)
        val prefix = rootPrefix
        val failed = spark.sparkContext
          .parallelize(orphans,
            math.min(math.max(1, orphans.size / 64),
              spark.sparkContext.defaultParallelism))
          .mapPartitions { rels =>
            val conf = new org.apache.hadoop.conf.Configuration(false)
            confBc.value.foreach { case (k, v) => conf.set(k, v) }
            val fs = new org.apache.hadoop.fs.Path(prefix)
              .getFileSystem(conf)
            rels.filterNot(rel => fs.delete(
              new org.apache.hadoop.fs.Path(prefix + rel), false))
          }.collect()
        if (failed.nonEmpty) throw new java.io.IOException(
          s"DeltaLog.vacuum: ${failed.length} orphan(s) could not be " +
            s"deleted, first: ${failed.head}")
      }
    }
    orphans.sorted
  }

  /** Sidecar parquet names a V2 checkpoint top references, without
    * loading the sidecars themselves (the cleanup walk needs names
    * only — content stays unread).
    */
  private def sidecarRefsOf(spark: SparkSession, root: String,
                            top: Path): Seq[String] =
    if (top.toString.endsWith(".parquet"))
      spark.read.schema(checkpointSchemaV2).parquet(top.toString)
        .where(col("sidecar").isNotNull)
        .select(col("sidecar.path")).collect().map(_.getString(0)).toSeq
    else jsonCheckpointRows(top)
      .flatMap(r => Option(r.getStruct(6)).map(_.getString(0)))

  /** Delta's METADATA cleanup — the `_delta_log` sibling of [[vacuum]]
    * (`delta.logRetentionDuration`, default `interval 30 days`): drop
    * commit JSONs and checkpoints a newer checkpoint has made
    * redundant once the history they serve ages past the retention
    * window. The cut lands on a CHECKPOINT boundary — the largest
    * checkpoint version whose every predecessor commit is expired —
    * so the retained log keeps the replay contract intact: every
    * version ≥ the cut still reconstructs from a retained checkpoint
    * plus a contiguous JSON tail, and time travel inside the window
    * is untouched. Expiry follows each commit's RECORDED timestamp
    * (`inCommitTimestamp` where the table carries the feature, else
    * commit-file mtime — the same clock [[versionAsOf]] resolves by),
    * and stops at the first unexpired commit, so a regressed
    * filesystem clock can only retain more, never gap the chain.
    * Unreferenced `_sidecars` parquet older than the window (from
    * deleted V2 tops, or interrupted checkpoint writes) is swept
    * last. Returns the deleted log-relative paths.
    */
  /** Change-data files a commit's `cdc` actions reference, log-relative
    * (the cleanup walk needs names only — content stays unread).
    */
  private def cdcRefsOf(root: String, v: Long): Seq[String] =
    Files.readAllLines(logDir(root).resolve(commitName(v))).asScala.toSeq
      .filter(_.trim.nonEmpty).flatMap { line =>
        val n = mapper.readTree(line)
        if (n.has("cdc"))
          Some(decodePath(n.path("cdc").path("path").asText()))
        else None
      }

  def cleanUpExpiredLogs(spark: SparkSession, root: String): Seq[String] = {
    val st = replay(spark, root, currentVersion(root))
    cleanUpExpiredLogs(spark, root, st.configuration
      .get("delta.logRetentionDuration").map(parseIntervalMs)
      .getOrElse(30L * 86400000L)) // Delta's documented default
  }

  def cleanUpExpiredLogs(spark: SparkSession, root: String,
                         retentionMs: Long): Seq[String] = {
    require(retentionMs >= 0L,
      "DeltaLog.cleanUpExpiredLogs: retentionMs >= 0")
    val refs = checkpointRefs(root)
    if (refs.isEmpty) return Seq.empty // the JSON chain IS the state
    val cutoffMs = System.currentTimeMillis() - retentionMs
    // expired commits form a PREFIX of the retained versions: stop at
    // the first unexpired one regardless of what follows
    val expiredPrefixMax = {
      var last = -1L
      val it = versions(root).iterator
      var go = true
      while (go && it.hasNext) {
        val v = it.next()
        if (commitTimestamp(root, v) <= cutoffMs) last = v else go = false
      }
      last
    }
    // the cut: largest checkpoint version every version BELOW which is
    // expired (a checkpoint with no JSON predecessors qualifies too —
    // versions(root) then starts at or above it)
    val cutOpt = refs.map(_.version).distinct.sorted.reverse.find(cv =>
      versions(root).forall(v => v >= cv || v <= expiredPrefixMax))
    val logd = logDir(root)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    cutOpt.foreach { cut =>
      // `cdc` actions live ONLY in commit JSONs (checkpoints exclude
      // them per the protocol), so the change-data files of the
      // reclaimed prefix become unreadable the moment their commits go
      // — sweep them with the commits. Vacuum deliberately never
      // touches `_change_data`; THIS is the one place a CDC file's
      // lifetime ends, because its sole reference is being deleted.
      // Retained commits' refs are subtracted defensively (a cdc file
      // is written by exactly one commit, so the set is empty today).
      val (expired, retained) = versions(root).partition(_ < cut)
      val deadCdc = expired.flatMap(cdcRefsOf(root, _)).toSet --
        retained.flatMap(cdcRefsOf(root, _)).toSet
      expired.foreach { v =>
        Files.delete(logd.resolve(commitName(v)))
        deleted += commitName(v)
      }
      deadCdc.toSeq.sorted
        .filter(r => r.startsWith("_change_data/") && !r.contains(".."))
        .foreach { rel =>
          val p = resolvePath(root, rel)
          if (Files.deleteIfExists(p)) deleted += rel
        }
      refs.filter(_.version < cut).foreach {
        case ClassicCp(_, parts) => parts.foreach { p =>
          Files.delete(p); deleted += p.getFileName.toString
        }
        case V2Cp(_, top) =>
          Files.delete(top); deleted += top.getFileName.toString
      }
    }
    // sweep sidecars no retained V2 top references — age-guarded so an
    // in-flight checkpointV2 (sidecars land before the top) is safe.
    // The age cutoff is bounded AWAY from 'now' by a fixed grace
    // window independent of the caller's retention: with retention 0
    // (the deterministic-gate form) the plain cutoff IS 'now', and
    // freshly-landed sidecars whose top has not yet been written
    // would be collected out from under the checkpoint being built.
    val sideCutoffMs = math.min(cutoffMs,
      System.currentTimeMillis() - SidecarSweepGraceMs)
    val sideDir = logd.resolve("_sidecars")
    if (Files.isDirectory(sideDir)) {
      val live: Set[String] = checkpointRefs(root).collect {
        case V2Cp(_, top) => sidecarRefsOf(spark, root, top)
      }.flatten.toSet
      val s = Files.list(sideDir)
      val onDisk =
        try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        finally s.close()
      onDisk.filter(p => !live(p.getFileName.toString) &&
        Files.getLastModifiedTime(p).toMillis <= sideCutoffMs).foreach { p =>
        Files.delete(p)
        deleted += "_sidecars/" + p.getFileName.toString
      }
    }
    deleted.toSeq.sorted
  }

  /** Delta `stats` JSON for a data file from its parquet FOOTER alone
    * (numRecords from row-group counts; minValues/maxValues/nullCount
    * per top-level primitive column from column-chunk statistics —
    * bytes read ∝ footer size, never data size). Columns whose chunks
    * lack usable statistics are omitted from min/max but still
    * null-counted when known.
    */
  private def footerStatsJson(file: Path,
                              conf: org.apache.hadoop.conf.Configuration): String = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(file.toString), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      // Raw per-column extrema folded across row groups with the
      // column's own parquet PrimitiveComparator — NOT Java
      // Comparable: binary stats order by UNSIGNED bytes, and
      // String.compareTo disagrees with that above 0x7f, which would
      // emit invalid bounds an external reader then data-skips on.
      final class ColAcc(var mn: AnyRef, var mx: AnyRef,
                         val cmp: java.util.Comparator[AnyRef],
                         val ptype: org.apache.parquet.schema.PrimitiveType)
      val accs = scala.collection.mutable.Map.empty[String, ColAcc]
      val nulls = scala.collection.mutable.Map.empty[String, Long]
      var statless = Set.empty[String]
      blocks.foreach(_.getColumns.asScala.foreach { c =>
        val path = c.getPath.toArray
        if (path.length == 1) {
          val name = path(0)
          val s = c.getStatistics
          if (s == null) statless += name
          else {
            if (s.isNumNullsSet)
              nulls(name) = nulls.getOrElse(name, 0L) + s.getNumNulls
            if (s.hasNonNullValue) {
              val mn = s.genericGetMin.asInstanceOf[AnyRef]
              val mx = s.genericGetMax.asInstanceOf[AnyRef]
              if (mn == null || mx == null) statless += name
              else accs.get(name) match {
                case Some(a) =>
                  if (a.cmp.compare(mn, a.mn) < 0) a.mn = mn
                  if (a.cmp.compare(mx, a.mx) > 0) a.mx = mx
                case None =>
                  accs(name) = new ColAcc(mn, mx,
                    s.comparator().asInstanceOf[java.util.Comparator[AnyRef]],
                    c.getPrimitiveType)
              }
            }
          }
        }
      })
      // Emit min/max ONLY for values whose JSON rendering preserves the
      // comparator's ordering: plain numerics/booleans, int-annotated
      // ints, DATE ints (rendered ISO, Delta's own form — lexicographic
      // order == date order for 4-digit years), int-backed DECIMALs
      // (rendered as scaled JSON numbers, Delta's own form), and
      // pure-ASCII utf8 strings (ASCII ⇒ unsigned-byte order ==
      // code-point order == JSON string order). FLBA-backed decimals,
      // timestamps and non-ASCII strings are omitted — the way Delta
      // itself truncates or skips what it cannot render faithfully.
      def renderable(pt: org.apache.parquet.schema.PrimitiveType,
                     v: AnyRef): Option[Any] = {
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val ann = pt.getLogicalTypeAnnotation
        val plainOrInt = ann == null ||
          ann.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation]
        def dec(unscaled: Long): Option[Any] = {
          val scale = ann
            .asInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
            .getScale
          Some(java.math.BigDecimal.valueOf(unscaled, scale))
        }
        v match {
          case b: java.lang.Boolean => Some(b)
          case l: java.lang.Long if plainOrInt => Some(l)
          case i: java.lang.Integer if plainOrInt => Some(i)
          case i: java.lang.Integer
            if ann.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
            val d = java.time.LocalDate.ofEpochDay(i.longValue()).toString
            if (IsoDateRe.matches(d)) Some(d) else None
          case l: java.lang.Long
            if ann.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] =>
            dec(l.longValue())
          case i: java.lang.Integer
            if ann.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] =>
            dec(i.longValue())
          case d: java.lang.Double if ann == null => Some(d)
          case f: java.lang.Float if ann == null => Some(f)
          case bin: org.apache.parquet.io.api.Binary
            if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
            (try Some(bin.toStringUsingUTF8) catch { case _: Throwable => None })
              .filter(_.forall(_ < 0x80))
          case _ => None
        }
      }
      val root = mapper.createObjectNode()
      root.put("numRecords", numRecords)
      val mnO = root.putObject("minValues")
      val mxO = root.putObject("maxValues")
      val nlO = root.putObject("nullCount")
      def putVal(o: com.fasterxml.jackson.databind.node.ObjectNode,
                 k: String, v: Any): Unit = v match {
        case l: java.lang.Long => o.put(k, l.longValue())
        case i: java.lang.Integer => o.put(k, i.intValue())
        case d: java.lang.Double => o.put(k, d.doubleValue())
        case f: java.lang.Float => o.put(k, f.floatValue())
        case b: java.lang.Boolean => o.put(k, b.booleanValue())
        case bd: java.math.BigDecimal => o.put(k, bd)
        case s: String => o.put(k, s)
        case other => o.put(k, other.toString)
      }
      accs.keySet.filterNot(statless).toSeq.sorted.foreach { k =>
        val a = accs(k)
        (renderable(a.ptype, a.mn), renderable(a.ptype, a.mx)) match {
          case (Some(lo), Some(hi)) => putVal(mnO, k, lo); putVal(mxO, k, hi)
          case _ => () // unrenderable bounds: omitted, readers keep the file
        }
      }
      nulls.keySet.toSeq.sorted.foreach(k => nlO.put(k, nulls(k)))
      mapper.writeValueAsString(root)
    } finally r.close()
  }

  /** Read the current snapshot (highest Delta commit). */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, currentVersion(root))

  /** Active table-relative files at `version` — the planning surface an
    * external integration scans (exposed for specs and manifests).
    */
  def filesAt(spark: SparkSession, root: String, version: Long): Seq[String] =
    replay(spark, root, version).files.map(_._1)

  // ------------------------------------------------------------------
  // Partitioned writer
  // ------------------------------------------------------------------

  /** Commit `df` to a PARTITIONED Delta table at `root` — hive-style
    * `col=value` data paths (Spark's `partitionBy` writes them, special
    * characters percent-escaped, nulls as `__HIVE_DEFAULT_PARTITION__`),
    * one `add` per file with its partition values in `partitionValues`,
    * `partitionColumns` declared in commit 0's `metaData`. `rewrite =
    * true` emits `remove` for every currently-active file first (the
    * INSERT OVERWRITE shape); `false` appends. Subsequent commits must
    * keep the same schema and partitioning (schema evolution on a
    * partitioned table is out of scope — fails loudly, never silently
    * diverges). Returns the committed Delta version.
    *
    * Scale posture: the data write is an ordinary distributed
    * `partitionBy` parquet write; everything else is one JSON line per
    * file. The file move into the table root is a same-filesystem
    * rename per file, and the commit point is the log file's atomic
    * rename — a crash beforehand leaves unreferenced files invisible
    * to readers.
    */
  def commitPartitioned(spark: SparkSession, root: String, df: DataFrame,
                        partitionCols: Seq[String],
                        rewrite: Boolean = false,
                        txn: Option[(String, Long)] = None,
                        configuration: Map[String, String] = Map.empty): Long = {
    require(partitionCols.nonEmpty,
      "DeltaLog.commitPartitioned: partitionCols must be non-empty " +
        "(use commitFlat for unpartitioned tables)")
    require(partitionCols.forall(df.columns.contains),
      s"DeltaLog.commitPartitioned: $partitionCols not all in ${df.columns.toSeq}")
    commitData(spark, root, df, partitionCols, rewrite, txn, configuration)
  }

  /** Commit `df` to an UNPARTITIONED Delta table at `root` — the flat
    * sibling of [[commitPartitioned]] with the same txn-watermark
    * exactly-once semantics (a replayed (appId, version) at or below
    * the recorded watermark is a no-op). An EMPTY `df` still commits
    * (protocol/metaData/txn actions, zero adds) so a watermark advances
    * even when a batch contributes no rows — the foreachBatch shape.
    */
  def commitFlat(spark: SparkSession, root: String, df: DataFrame,
                 rewrite: Boolean = false,
                 txn: Option[(String, Long)] = None,
                 configuration: Map[String, String] = Map.empty,
                 mergeSchema: Boolean = false,
                 writeOptions: Map[String, String] = Map.empty): Long =
    commitData(spark, root, df, Seq.empty, rewrite, txn, configuration,
      mergeSchema, writeOptions)

  /** Parquet writer options enabling a BLOOM FILTER on each column —
    * the per-file point-lookup index [[readWhereLongPoint]] consults:
    * on an UNSORTED column min/max stats cannot prune (every file
    * spans the range), but the bloom answers "definitely absent" from
    * footer bytes alone. Pass to `commitFlat(writeOptions = …)`;
    * `ndv` sizes the filter (expected distinct values per file).
    */
  def bloomOptions(cols: Seq[String], ndv: Long = 0L): Map[String, String] =
    cols.flatMap { c =>
      Seq(s"parquet.bloom.filter.enabled#$c" -> "true") ++
        (if (ndv > 0L)
          Seq(s"parquet.bloom.filter.expected.ndv#$c" -> ndv.toString)
        else Nil)
    }.toMap

  private def commitData(spark: SparkSession, root: String, df: DataFrame,
                         partitionCols: Seq[String], rewrite: Boolean,
                         txn: Option[(String, Long)],
                         configuration: Map[String, String] = Map.empty,
                         mergeSchema: Boolean = false,
                         writeOptions: Map[String, String] = Map.empty): Long = {
    val v = currentVersion(root) + 1
    val prior =
      if (v == 0L) None
      else Some(replay(spark, root, v - 1))
    // generated columns: compute what the batch lacks / verify what it
    // provides, BEFORE the schema-shape check sees the batch
    val dfG0 = prior.flatMap(_.schema) match {
      case Some(ds) => applyGeneratedColumns(df, ds)
      case None => df
    }
    // identity columns: a batch lacking one continues ABOVE the
    // recorded high-water mark — distributed block assignment
    // (monotonically_increasing_id: unique, step-aligned, gaps legal —
    // Delta's documented identity semantics), one pass, no global sort
    val dfG = prior.flatMap(_.schema) match {
      case Some(ds) =>
        identityInfo(ds).foldLeft(dfG0) { case (d, ic) =>
          if (!d.columns.contains(ic.name)) {
            val base = ic.hwm.getOrElse(ic.start - ic.step)
            d.withColumn(ic.name, (lit(base + ic.step) + lit(ic.step) *
              org.apache.spark.sql.functions.monotonically_increasing_id())
              .cast(LongType))
          } else {
            require(ic.allowExplicit,
              s"DeltaLog.commitData: ${ic.name} is GENERATED ALWAYS AS " +
                "IDENTITY — explicit values refuse " +
                "(allowExplicitInsert=false)")
            d
          }
        }
      case None => dfG0
    }
    // CREATION with column mapping: assign every field its columnId +
    // a fresh physicalName (the ALTER TABLE SET columnMapping upgrade
    // shape) so the very first files land under physical names/ids
    val createMode =
      if (prior.isEmpty)
        configuration.getOrElse("delta.columnMapping.mode", "none")
      else "none"
    require(createMode == "none" || createMode == "name"
        || createMode == "id",
      s"DeltaLog.commitData: columnMapping mode '$createMode' is " +
        "unsupported (none, name, id)")
    val (createdSchema, createdConfig) =
      if (createMode == "none") (None, configuration)
      else {
        val (ms, maxId) = assignMapping(dfG.schema, 0L)
        (Some(ms), configuration +
          ("delta.columnMapping.maxColumnId" -> maxId.toString))
      }
    var evolvedSchema: Option[StructType] = None
    var evolvedConfig: Option[Map[String, String]] = None
    prior.foreach { st =>
      requireWritableMapping(st, "commitData")
      requireWritable(st, "commitData")
      require(st.partitionColumns == partitionCols,
        s"DeltaLog.commitData: table is partitioned by " +
          s"${st.partitionColumns}, got $partitionCols")
      // nullability and field metadata (generation markers, comments)
      // are write-path metadata, not a schema change: a stricter
      // (non-null) batch may land in a nullable table and vice versa —
      // Delta's own writer behaves the same way
      def norm(dt: DataType): DataType = normSchema(dt)
      st.schema.foreach { sch =>
        if (norm(sch) != norm(dfG.schema)) {
          require(mergeSchema,
            "DeltaLog.commitData: schema change on a committed table — " +
              "pass mergeSchema=true for additive evolution, or rewrite " +
              "to a new root")
          // Delta's mergeSchema: shared columns keep their declared
          // type (no silent casts/widening), columns absent from the
          // batch stay (their files simply lack them — the declared-
          // schema read returns null), genuinely NEW top-level columns
          // append as nullable and the commit re-emits metaData with
          // the evolved schema (the Delta schema-evolution idiom).
          val byName = sch.fields.map(f => f.name -> f).toMap
          dfG.schema.fields.filter(f => byName.contains(f.name))
            .foreach(f => require(
              norm(byName(f.name).dataType) == norm(f.dataType),
              s"DeltaLog.commitData: column ${f.name} is " +
                s"${byName(f.name).dataType} in the table but " +
                s"${f.dataType} in the batch — type changes are not " +
                "schema evolution"))
          val newFields = dfG.schema.fields
            .filterNot(f => byName.contains(f.name))
            .map(_.copy(nullable = true))
          // evolution re-emits metaData, never protocol — a variant
          // column sneaking in through mergeSchema would leave the
          // table's declared features silent about bytes external
          // readers cannot interpret
          newFields.foreach(nf => require(!hasVariantType(nf.dataType),
            s"DeltaLog.commitData: new column ${nf.name} is VARIANT — " +
              "variant columns enter at table CREATION (the " +
              "variantType feature must be declared by the protocol " +
              "from commit 0), not through mergeSchema evolution"))
          if (newFields.nonEmpty) {
            if (mappingMode(st) == "none")
              evolvedSchema = Some(StructType(sch.fields ++ newFields))
            else {
              // mapped evolution: new columns get fresh ids/physical
              // names above the recorded maxColumnId, which bumps
              val startId = st.configuration
                .get("delta.columnMapping.maxColumnId")
                .flatMap(_.toLongOption)
                .getOrElse(sch.fields.collect {
                  case f if f.metadata.contains(ColumnIdKey) =>
                    f.metadata.getLong(ColumnIdKey)
                }.foldLeft(0L)(math.max))
              val (assigned, maxId) =
                assignMapping(StructType(newFields), startId)
              evolvedSchema = Some(StructType(sch.fields ++ assigned.fields))
              evolvedConfig = Some(st.configuration +
                ("delta.columnMapping.maxColumnId" -> maxId.toString))
            }
          }
        }
      }
    }
    // Exactly-once via txn watermarks (the protocol's mechanism): if
    // this (appId, version) is at or below the log's recorded watermark
    // the batch already landed — a replay is a NO-OP, not a double
    // append. This is what makes a foreachBatch streaming sink on this
    // writer idempotent across micro-batch replays.
    txn.foreach { case (app, ver) =>
      val applied = prior.exists(
        _.txnVersions.get(app).exists(_ >= ver))
      if (applied) return v - 1
    }
    Files.createDirectories(Paths.get(root))
    val stagingPath = Files.createTempDirectory(stagingBase(root),
      "graft-delta-part")
    // writer invariants ride the write itself — NOT NULL columns and
    // delta.constraints.* CHECKs fail the batch before a commit lands
    val declared = evolvedSchema.orElse(prior.flatMap(_.schema))
      .orElse(createdSchema).getOrElse(dfG.schema)
    val enforced = enforceInvariants(dfG, declared,
      prior.map(_.configuration).getOrElse(configuration))
    // mapped target (pre-existing OR being created): the batch lands
    // under PHYSICAL field names (+field ids in id mode), partition
    // directories and partitionValues keyed physical
    val physMap = prior.map(physicalWriteMap(_, declared))
      .getOrElse(createdSchema.map(physicalTopLevel).getOrElse(Map.empty))
    val outFieldIds = prior.map(physFieldIds(_, declared)).getOrElse(
      if (createMode == "id") fieldIdsOf(declared)
      else Map.empty[String, Long])
    val wantIds = prior.map(mappingMode(_) == "id")
      .getOrElse(createMode == "id")
    val physOut =
      if (physMap.isEmpty) enforced
      else stampFieldIds(
        enforced.select(enforced.columns.toIndexedSeq.map { c =>
          declared.fields.find(_.name == c) match {
            case Some(f) =>
              toPhysicalField(wantIds, f, physMap.getOrElse(c, c))
            case None => col(c)
          }
        }: _*),
        outFieldIds)
    val physPcs = partitionCols.map(c => physMap.getOrElse(c, c))
    val writer = physOut.write.mode("overwrite").options(writeOptions)
    (if (physPcs.nonEmpty) writer.partitionBy(physPcs: _*)
     else writer).parquet(stagingPath.toString)
    // Move each data file into the table root under its partition path
    // (same-filesystem by construction — see stagingBase).
    val moved = Seq.newBuilder[(String, Map[String, String])]
    val walk = Files.walk(stagingPath)
    val dataFiles =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .toSeq
      finally walk.close()
    dataFiles.foreach { p =>
      val rel = stagingPath.relativize(p).toString
        .replace(java.io.File.separatorChar, '/')
      val target = Paths.get(root, rel)
      Files.createDirectories(target.getParent)
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      moved += rel -> partitionValuesOf(rel, physPcs)
    }
    deleteRecursively(stagingPath)
    val added = moved.result()
    // a partitioned write always yields files; a flat EMPTY batch may
    // legitimately yield none (the commit still advances the watermark)
    require(added.nonEmpty || partitionCols.isEmpty,
      s"DeltaLog.commitData: write produced no parquet files")
    val tableId = java.util.UUID.nameUUIDFromBytes(
      ("graft-delta:" + root).getBytes("UTF-8")).toString
    Files.createDirectories(logDir(root))
    require(configuration.isEmpty || v == 0L,
      "DeltaLog.commitData: table configuration is set at CREATION " +
        "(version 0) only — later commits inherit it")
    val actions = Seq.newBuilder[JsonNode]
    val ictEnabled = configuration.get("delta.enableInCommitTimestamps")
      .exists(_.trim.equalsIgnoreCase("true"))
    // VARIANT columns require the variantType reader+writer feature
    // from commit 0 — external readers must refuse-or-support by
    // declaration, never discover variant bytes mid-scan
    val hasVariant = hasVariantType(createdSchema.getOrElse(dfG.schema))
    if (v == 0L) {
      val protocol = mapper.createObjectNode()
      val p = protocol.putObject("protocol")
      // column mapping requires reader 2 (legacy form); variant the
      // features form (reader 3)
      p.put("minReaderVersion",
        if (hasVariant) 3 else if (createMode != "none") 2 else 1)
      if (hasVariant) {
        val rf = p.putArray("readerFeatures")
        ((if (createMode != "none") Seq("columnMapping") else Seq.empty)
          :+ "variantType").foreach(rf.add)
      }
      // change data feed AND generated columns are legacy
      // writer-version-4 features (PROTOCOL.md: Writer Version
      // Requirements) — a table created with either must declare the
      // writer floor that implies them. In-commit timestamps have no
      // legacy floor: they force the features form (writer 7) with the
      // implied legacy features enumerated.
      val legacyFloor0 =
        if (identityInfo(dfG.schema).nonEmpty) 6
        else if (configuration.get("delta.enableChangeDataFeed")
          .exists(_.trim.equalsIgnoreCase("true")) ||
          generationExprs(dfG.schema).nonEmpty) 4 else 2
      // columnMapping's legacy writer floor is 5
      val legacyFloor =
        if (createMode != "none") math.max(legacyFloor0, 5)
        else legacyFloor0
      if (ictEnabled || hasVariant) {
        p.put("minWriterVersion", 7)
        val wf = p.putArray("writerFeatures")
        (legacyWriterFeatures(legacyFloor) ++
          (if (ictEnabled) Seq("inCommitTimestamp") else Nil) ++
          (if (hasVariant) Seq("variantType") else Nil))
          .distinct.foreach(wf.add)
      } else p.put("minWriterVersion", legacyFloor)
      actions += protocol
      actions += metaDataAction(tableId,
        createdSchema.getOrElse(dfG.schema).json, partitionCols,
        createdConfig)
    }
    // additive evolution: re-emit metaData with the widened schema,
    // preserving the table's ORIGINAL id and configuration
    evolvedSchema.foreach { es =>
      val st = prior.get
      actions += metaDataAction(st.tableId, es.json, partitionCols,
        evolvedConfig.getOrElse(st.configuration))
    }
    txn.foreach { case (app, ver) =>
      val n = mapper.createObjectNode()
      val t = n.putObject("txn")
      t.put("appId", app)
      t.put("version", ver)
      actions += n
    }
    if (rewrite) prior.foreach { st =>
      requireNotAppendOnly(st, "commitData(rewrite)")
      st.files.foreach { case (path, _) =>
        actions += removeActionNode(path, dataChange = true)
      }
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val addNodes = added.map { case (rel, pv) =>
      addActionNode(root, rel, pv, dataChange = true, conf)
    }
    addNodes.foreach(actions += _)
    // identity high-water marks: fold each identity column's max over
    // the written files' EMBEDDED footer stats (zero extra IO) and
    // re-emit metaData whenever the mark advanced — the contract the
    // next batch's assignment continues from
    // `declared` (not the bare batch schema): a mapped CREATION records
    // its assigned physicalNames here, and the stats fold must key them
    val hwmSchema = declared
    val idents = identityInfo(hwmSchema)
    if (idents.nonEmpty && addNodes.nonEmpty) {
      var sch = hwmSchema
      var changed = false
      idents.foreach { ic =>
        // footer-derived stats key by PHYSICAL name on mapped tables
        val statsKey = physicalTopLevel(
          StructType(hwmSchema.filter(_.name == ic.name)))
          .getOrElse(ic.name, ic.name)
        val maxes = addNodes.flatMap { n =>
          val stats = n.path("add").path("stats")
          if (!stats.isTextual) None
          else {
            val mx = mapper.readTree(stats.asText())
              .path("maxValues").path(statsKey)
            if (mx.isNumber) Some(mx.asLong()) else None
          }
        }
        if (maxes.nonEmpty && ic.hwm.forall(_ < maxes.max)) {
          sch = withHwm(sch, ic.name, maxes.max); changed = true
        }
      }
      if (changed)
        actions += metaDataAction(
          prior.map(_.tableId).getOrElse(tableId), sch.json,
          partitionCols,
          evolvedConfig.getOrElse(
            prior.map(_.configuration).getOrElse(createdConfig)))
    }
    // blind appends (the common ingest shape) reconcile version
    // collisions with a concurrent writer — see [[writeCommitFile]];
    // schema-evolving / creating / rewriting commits refuse as before
    val committed = writeCommitFile(root, v, actions.result(),
      operation = "WRITE", ictStart = v == 0L && ictEnabled,
      retryDataConflicts = true)
    prior.foreach(postCommit(spark, root, _, committed))
    committed
  }

  /** The commit version that carries `txn` action (appId, txnVersion) —
    * the anchor a restart-safe consumer uses to time-travel to the
    * state just BEFORE a given batch landed. Scans the retained JSON
    * commits newest-first (checkpoints compact txn actions to their
    * latest watermark, so only the retained tail is addressable — in
    * the replay-recent-batch use this is always the live window).
    */
  /** The recorded txn watermark for `appId` on this table (highest
    * `txn.version` replayed into the current state), or None for a
    * fresh consumer / nonexistent table — the restart anchor an
    * exactly-once incremental consumer reads before deciding what
    * still needs applying.
    */
  def txnWatermark(spark: SparkSession, root: String,
                   appId: String): Option[Long] =
    if (!Files.isDirectory(logDir(root))) None
    else replay(spark, root, currentVersion(root)).txnVersions.get(appId)

  def txnCommitVersion(root: String, appId: String,
                       txnVersion: Long): Option[Long] =
    versions(root).sorted.reverse.find { v =>
      Files.readAllLines(logDir(root).resolve(commitName(v))).asScala
        .filter(_.trim.nonEmpty).exists { line =>
          val n = mapper.readTree(line)
          n.has("txn") &&
            n.get("txn").path("appId").asText("") == appId &&
            n.get("txn").path("version").asLong(Long.MinValue) == txnVersion
        }
    }

  /** OPTIMIZE for a partitioned Delta table: every partition holding
    * more than one active file is rewritten as ONE file, committed as
    * `remove` + `add` actions with `dataChange = false` — the
    * protocol's compaction idiom (readers know no rows changed, so
    * streaming consumers skip the commit). Partitions already at one
    * file are untouched; if nothing needs compacting no commit is
    * written. Returns the table's version afterwards.
    *
    * Scale posture: ONE job for every fat partition — the DV/clone/
    * mapping-aware assembly reads live rows and a dynamic-partitioned
    * write lands one file per partition directory (hash repartition on
    * the partition columns), so compacting 10 k fat partitions is one
    * scan + one write, never 10 k sequential jobs; the commit is one
    * JSON line per touched file. DV-carrying files compact to their
    * LIVE rows with the DV cleared (Delta's OPTIMIZE semantics) and
    * shallow-cloned absolute references MATERIALIZE under this table's
    * root — the clone-localization pass. One-file-per-partition is the
    * local-scale simplification of OPTIMIZE's bin-to-target-size — a
    * partition bigger than a sane file would bin into
    * ceil(bytes/target) files instead.
    * (Unpartitioned [[Snapshots]] tables compact through their own
    * OPTIMIZE; this is the partitioned-layout sibling.)
    *
    * `targetRowsPerFile` bins each partition's output at the target
    * inside the same job (a 100 TB partition must not serialize into
    * one file); binned runs are maintenance passes, not no-op
    * idempotent like the default one-file shape.
    */
  /** `OPTIMIZE … ZORDER BY (x, y)` through the Delta log: the current
    * active set rewrites Z-clustered ([[Layout.zorderWrite]] —
    * Morton-keyed range partitioning + in-partition sort, one shuffle)
    * as `remove`+`add` with `dataChange=false`: identical logical rows,
    * so append tails skip the commit and every earlier version stays
    * time-travelable until vacuum. Each new file covers a contiguous
    * Morton run = a small (x, y) rectangle, so its footer min/max are
    * NARROW on both dimensions and [[readWhereLong]]/external
    * data-skipping readers prune selective reads on EITHER column —
    * the reason to Z-order at all. Deletion vectors are APPLIED and
    * cleared (Delta's own OPTIMIZE does the same), and shallow-cloned
    * absolute references are MATERIALIZED under this table's root —
    * this is the clone-localization pass [[compactPartitioned]]'s
    * refusal points at. Both columns must be LONG (the Morton fold's
    * contract). No-op on an empty table.
    *
    * PARTITIONED tables cluster WITHIN each partition (Delta's own
    * `OPTIMIZE … ZORDER BY` semantics — the README's recommended
    * maintenance for date-partitioned silver): one range exchange on
    * (partition cols, morton) + one dynamic-partitioned write, so
    * every output file stays inside its hive directory and covers a
    * contiguous Morton run there. `numFiles` is the TABLE-wide target;
    * range partitioning apportions files to partitions by sampled row
    * share. Still one shuffle + one job at any partition count.
    */
  def optimizeZOrder(spark: SparkSession, root: String, xCol: String,
                     yCol: String, bits: Int, numFiles: Int): Long = {
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritableMapping(st, "optimizeZOrder")
    requireWritable(st, "optimizeZOrder")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog.optimizeZOrder: no metaData in $root log"))
    val pcs = st.partitionColumns
    val pcSet = pcs.toSet
    Seq(xCol, yCol).foreach { c =>
      require(schema.fieldNames.contains(c),
        s"DeltaLog.optimizeZOrder: column $c not in schema")
      require(!pcSet(c),
        s"DeltaLog.optimizeZOrder: $c is a partition column — Z-order " +
          "clusters data columns within partitions")
      require(schema(c).dataType == LongType,
        s"DeltaLog.optimizeZOrder: $c is ${schema(c).dataType}, the " +
          "Morton fold needs LongType")
    }
    if (st.files.isEmpty) return v
    // DV-aware, clone-aware current read — deleted rows drop out here;
    // mapped tables rewrite under PHYSICAL names (+field ids), with the
    // Morton fold running on the renamed columns
    val physMap = physicalWriteMap(st, schema)
    val df = readAt(spark, root, v)
    val staging = Files.createTempDirectory(stagingBase(root),
      "graft-delta-zorder")
    val conf = spark.sparkContext.hadoopConfiguration
    val actions = Seq.newBuilder[JsonNode]
    st.files.foreach { case (rel, _) =>
      actions += removeActionNode(rel, dataChange = false)
    }
    if (pcs.isEmpty) {
      Layout.zorderWrite(toPhysicalDf(st, schema, df), staging.toString,
        physMap.getOrElse(xCol, xCol), physMap.getOrElse(yCol, yCol),
        bits, numFiles)
      val listed = Files.list(staging)
      val parts =
        try listed.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        finally listed.close()
      require(parts.nonEmpty,
        s"DeltaLog.optimizeZOrder: rewrite produced no parquet files")
      parts.sortBy(_.getFileName.toString).foreach { p =>
        val target = Paths.get(root).resolve(p.getFileName)
        Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
        actions += addActionNode(root, target.getFileName.toString,
          Map.empty, dataChange = false, conf)
      }
    } else {
      // per-partition clustering in ONE job: range-partition on
      // (partition cols, morton key) so contiguous Morton runs stay
      // inside each partition value, then one dynamic-partitioned
      // write routes every file into its hive directory
      val physPcs = pcs.map(c => physMap.getOrElse(c, c))
      val m = lit(1L << bits)
      val physX = physMap.getOrElse(xCol, xCol)
      val physY = physMap.getOrElse(yCol, yCol)
      toPhysicalDf(st, schema, df)
        .withColumn("__zkey", Layout.mortonKey(
          pmod(col(physX), m), pmod(col(physY), m), bits))
        .repartitionByRange(numFiles,
          physPcs.map(col) :+ col("__zkey"): _*)
        .sortWithinPartitions(physPcs.map(col) :+ col("__zkey"): _*)
        .drop("__zkey")
        .write.mode("overwrite").partitionBy(physPcs: _*)
        .parquet(staging.toString)
      val walk = Files.walk(staging)
      val parts =
        try walk.iterator().asScala
          .filter(p => Files.isRegularFile(p)
            && p.getFileName.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.toString)
        finally walk.close()
      require(parts.nonEmpty,
        s"DeltaLog.optimizeZOrder: rewrite produced no parquet files")
      // prefer the RECORDED pv rendering over the re-parsed directory
      // string (same rationale as compactPartitioned)
      val pcTypes = pcs.map(c =>
        physMap.getOrElse(c, c) -> schema(c).dataType).toMap
      val recordedPvs = st.files.map(_._2).distinct
      parts.foreach { p =>
        val rel = staging.relativize(p).toString
          .replace(java.io.File.separatorChar, '/')
        val target = Paths.get(root, rel)
        Files.createDirectories(target.getParent)
        Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
        actions += addActionNode(root, rel,
          preferRecordedPv(partitionValuesOf(rel, physPcs), recordedPvs,
            physPcs, pcTypes),
          dataChange = false, conf)
      }
    }
    deleteRecursively(staging)
    writeCommitFile(root, v + 1, actions.result(), operation = "OPTIMIZE")
    postCommit(spark, root, st, v + 1)
    v + 1
  }

  def compactPartitioned(spark: SparkSession, root: String,
                         targetRowsPerFile: Option[Long] = None): Long = {
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    requireWritableMapping(st, "compactPartitioned")
    require(st.partitionColumns.nonEmpty,
      "DeltaLog.compactPartitioned: table is not partitioned " +
        "(use Snapshots OPTIMIZE for flat tables)")
    requireWritable(st, "compactPartitioned")
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog.compactPartitioned: no metaData in $root log"))
    val pcSet = st.partitionColumns.toSet
    val pcs = st.partitionColumns
    // a partition needs compacting when it holds more than one file,
    // any DV'd file (compaction APPLIES and clears the DV — Delta's
    // OPTIMIZE semantics) or a shallow-cloned absolute reference (the
    // clone-localization pass)
    val fat = st.files.groupBy(_._2).filter { case (_, files) =>
      files.size > 1 || files.exists { case (rel, _) =>
        st.fileDvs.contains(rel) || rel.startsWith("/") }
    }
    if (fat.isEmpty) return v
    val fatFiles = fat.values.flatten.toSeq.sortBy(_._1)
    val actions = Seq.newBuilder[JsonNode]
    val conf = spark.sparkContext.hadoopConfiguration
    // ONE job for every fat partition (was: one sequential job per
    // partition): the DV/clone/mapping-aware assembly reads live rows
    // with partition literals attached, and a dynamic-partitioned
    // write lands exactly one file per partition directory
    val physMap = physicalWriteMap(st, schema)
    val physPcs = pcs.map(c => physMap.getOrElse(c, c))
    val staging = Files.createTempDirectory(stagingBase(root),
      "graft-delta-compact")
    // bin-to-target-size: a 100 TB-scale partition must not serialize
    // into one giant file — maxRecordsPerFile splits each partition's
    // output at the target inside the same single job (None keeps the
    // one-file-per-partition local-scale shape)
    val binned = targetRowsPerFile.map { n =>
      require(n >= 1, s"compactPartitioned: targetRowsPerFile >= 1, got $n")
      Map("maxRecordsPerFile" -> n.toString)
    }.getOrElse(Map.empty[String, String])
    toPhysicalDf(st, schema, assembleFiles(spark, root, st, fatFiles))
      .repartition(fat.size, physPcs.map(col): _*)
      .write.options(binned).mode("overwrite").partitionBy(physPcs: _*)
      .parquet(staging.toString)
    val walk = Files.walk(staging)
    val parts =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.toString)
      finally walk.close()
    fatFiles.foreach { case (rel, _) =>
      actions += removeActionNode(rel, dataChange = false) }
    // re-emit the RECORDED pv strings where they denote the same typed
    // partition — the dynamic write's directory rendering can normalize
    // them (int '01' → '1'), and pv-string drift splits the partition
    // for string-grouping log consumers
    val pcTypes = pcs.map(c =>
      physMap.getOrElse(c, c) -> schema(c).dataType).toMap
    parts.foreach { p =>
      val rel = staging.relativize(p).toString
        .replace(java.io.File.separatorChar, '/')
      val target = Paths.get(root, rel)
      Files.createDirectories(target.getParent)
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      actions += addActionNode(root,
        rel,
        preferRecordedPv(partitionValuesOf(rel, physPcs), fat.keys,
          physPcs, pcTypes),
        dataChange = false, conf)
    }
    deleteRecursively(staging)
    writeCommitFile(root, v + 1, actions.result(), operation = "OPTIMIZE")
    postCommit(spark, root, st, v + 1)
    v + 1
  }

  /** Delta-style timestamp time travel: the version whose commit file
    * is the newest one modified at or before `tsMillis` (Delta resolves
    * timestamps from commit-file modification times). JSON commits
    * only — a checkpoint-compacted prefix has no commit files left to
    * date, matching Delta's own behavior of refusing timestamps older
    * than the retained history.
    */
  def versionAsOf(root: String, tsMillis: Long): Long = {
    val vs = versions(root).filter(v => commitTimestamp(root, v) <= tsMillis)
    require(vs.nonEmpty,
      s"DeltaLog: no commit at or before $tsMillis in $root " +
        "(older than retained history, or table is newer)")
    vs.max
  }

  /** A commit's effective timestamp: `commitInfo.inCommitTimestamp`
    * when the writer recorded one (the `inCommitTimestamps` table
    * feature — filesystem-clock-independent, PROTOCOL.md), else the
    * commit file's modification time (classic Delta resolution).
    */
  private def commitTimestamp(root: String, v: Long): Long = {
    val f = logDir(root).resolve(commitName(v))
    Files.readAllLines(f).asScala.iterator
      .filter(_.trim.nonEmpty).map(mapper.readTree)
      .find(_.has("commitInfo"))
      .map(_.get("commitInfo").path("inCommitTimestamp"))
      .filter(_.isNumber).map(_.asLong())
      .getOrElse(Files.getLastModifiedTime(f).toMillis)
  }

  /** Read the table as of a wall-clock timestamp (millis). */
  def readAsOf(spark: SparkSession, root: String, tsMillis: Long): DataFrame =
    readAt(spark, root, versionAsOf(root, tsMillis))

  /** First retained version whose effective timestamp ([[versionAsOf]]'s
    * ICT-aware clock) is at or after `tsMillis` — the streaming
    * source's `startingTimestamp` rule; None when every retained
    * commit predates the bound (stream only what arrives next).
    */
  def firstVersionAtOrAfter(root: String, tsMillis: Long): Option[Long] =
    versions(root).find(v => commitTimestamp(root, v) >= tsMillis)

  /** RESTORE to the snapshot a TIMESTAMP resolves — the
    * `RESTORE TABLE ... TO TIMESTAMP AS OF` form (latest commit at or
    * before `tsMillis`, [[versionAsOf]]'s ICT-aware clock) of the
    * version-exact [[restore]].
    */
  def restoreAsOf(spark: SparkSession, root: String, tsMillis: Long): Long =
    restore(spark, root, versionAsOf(root, tsMillis))

  /** Change feed by TIMESTAMP window — Delta's `startingTimestamp`/
    * `endingTimestamp` form of [[readChangeFeed]]: the window covers
    * every commit whose effective timestamp ([[versionAsOf]]'s clock,
    * `inCommitTimestamp`-aware) lies in `[fromTs, toTs]`. Delta's own
    * boundary rules: the FIRST commit at or after `fromTs` opens the
    * window, the last commit at or before `toTs` closes it; a window
    * no commit lands in refuses loudly (like an out-of-range version
    * pair) rather than answering an empty feed that silently drops
    * changes.
    */
  def readChangeFeedAsOf(spark: SparkSession, root: String, fromTs: Long,
                         toTs: Long = Long.MaxValue): DataFrame = {
    require(fromTs <= toTs,
      s"DeltaLog.readChangeFeedAsOf: empty window ($fromTs > $toTs)")
    val vs = versions(root)
    val from = vs.find(v => commitTimestamp(root, v) >= fromTs)
      .getOrElse(throw new IllegalArgumentException(
        s"DeltaLog.readChangeFeedAsOf: no commit at or after $fromTs " +
          s"in $root"))
    val to = vs.filter(v => commitTimestamp(root, v) <= toTs)
    require(to.nonEmpty && to.max >= from,
      s"DeltaLog.readChangeFeedAsOf: no commit inside [$fromTs, $toTs] " +
        s"in $root")
    readChangeFeed(spark, root, from - 1, to.max)
  }

  /** DESCRIBE-HISTORY surface: one row per RETAINED JSON commit with
    * the `commitInfo` provenance Delta writers (and this one) record —
    * (version, operation, timestamp). The timestamp prefers
    * `commitInfo.timestamp` / `inCommitTimestamp`, falling back to the
    * commit file's mtime; commits an external writer laid down without
    * commitInfo surface a null operation rather than being hidden.
    * Driver work is one JSON scan per retained commit — checkpointed
    * history beyond the retained tail is summarized state and has no
    * per-commit provenance to report.
    */
  /** `DESCRIBE DETAIL` — the one-row table summary Delta surfaces:
    * format/id/location, partitioning, active file count and total
    * bytes (recorded `add.size`, falling back to the filesystem),
    * deletion-vector count, current version, protocol floors and the
    * table properties. Metadata-only: reads the log, never data.
    */
  def detail(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val v = currentVersion(root)
    val st = replay(spark, root, v)
    val bytes = st.files.map { case (rel, _) =>
      st.fileSizes.getOrElse(rel, Files.size(resolvePath(root, rel)))
    }.sum
    Seq(("parquet", st.tableId,
      Paths.get(root).toAbsolutePath.normalize().toString,
      st.partitionColumns, st.files.size.toLong, bytes,
      st.fileDvs.size.toLong, v, st.minReaderVersion,
      st.minWriterVersion, st.configuration))
      .toDF("format", "id", "location", "partitionColumns", "numFiles",
        "sizeInBytes", "numDeletionVectors", "version",
        "minReaderVersion", "minWriterVersion", "properties")
  }

  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(root).sorted.map { v =>
      val ci = Files.readAllLines(logDir(root).resolve(commitName(v)))
        .asScala.iterator.filter(_.trim.nonEmpty).map(mapper.readTree)
        .find(_.has("commitInfo")).map(_.get("commitInfo"))
      (v,
        ci.map(_.path("operation")).filter(_.isTextual)
          .map(_.asText()).orNull,
        ci.map(_.path("timestamp")).filter(_.isNumber).map(_.asLong())
          .getOrElse(commitTimestamp(root, v)))
    }.toDF("version", "operation", "timestamp")
  }

  /** Prefer a RECORDED partitionValues map over the `parsed` rendering
    * of a dynamically-written directory when exactly one recorded map
    * denotes the same TYPED partition: the cast-and-render round trip
    * normalizes value strings (an int partition recorded '01' re-parses
    * as '1'), and re-emitting the drifted rendering makes
    * string-grouping consumers treat one partition as two until the
    * next full compaction. String compare first (the common, exact
    * case); numeric columns fall back to a BigDecimal compare.
    * Ambiguity or no match keeps `parsed` — correctness never depends
    * on this, it is a log-stability nicety.
    */
  private def preferRecordedPv(parsed: Map[String, String],
      recorded: Iterable[Map[String, String]],
      physPcs: Seq[String],
      pcTypes: Map[String, DataType]): Map[String, String] = {
    def sameTyped(a: String, b: String, dt: DataType): Boolean =
      (a == null && b == null) || (a != null && b != null && (a == b || {
        dt match {
          case LongType | IntegerType | ShortType | ByteType | DoubleType |
               FloatType | _: DecimalType =>
            try new java.math.BigDecimal(a)
              .compareTo(new java.math.BigDecimal(b)) == 0
            catch { case _: NumberFormatException => false }
          case _ => false
        }
      }))
    val matches = recorded.filter(r =>
      physPcs.forall(c => r.contains(c) &&
        sameTyped(r(c), parsed.getOrElse(c, null),
          pcTypes.getOrElse(c, StringType)))).toSeq.distinct
    matches match {
      case Seq(one) => one
      case _ => parsed
    }
  }

  /** Parse `col=value` segments of a hive-laid-out relative path into
    * the add's `partitionValues`: hive percent-escapes decode,
    * `__HIVE_DEFAULT_PARTITION__` means null.
    */
  private def partitionValuesOf(rel: String,
                                partitionCols: Seq[String]): Map[String, String] = {
    val segs = rel.split('/').dropRight(1)
    require(segs.length == partitionCols.length
      && segs.zip(partitionCols).forall { case (s, c) =>
        s.startsWith(c + "=") },
      s"DeltaLog: path '$rel' does not match partitioning $partitionCols")
    segs.zip(partitionCols).map { case (s, c) =>
      val raw = s.drop(c.length + 1)
      val dec = unescapeHive(raw)
      c -> (if (dec == "__HIVE_DEFAULT_PARTITION__") null else dec)
    }.toMap
  }

  /** Hive path unescape: ONLY %XX sequences (hive's escapePathName never
    * writes '+'; URLDecoder would corrupt a literal '+' to a space).
    */
  private def unescapeHive(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Inverse of [[unescapeHive]] — hive's escapePathName character set
    * (control chars, DEL, double-quote, hash, percent, quote, star,
    * slash, colon, equals, question mark, backslash, braces, brackets,
    * caret) percent-encodes; everything else passes through (hive does
    * NOT escape spaces or '+', which is why [[unescapeHive]] must not
    * URL-decode).
    */
  private def escapeHive(s: String): String = {
    val special = "\"#%'*/:=?\\{[]^"
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach { c =>
      if (c < ' ' || c == '\u007f' || special.indexOf(c.toInt) >= 0)
        sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }
}
