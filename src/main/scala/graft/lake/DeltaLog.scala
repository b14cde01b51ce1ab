package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Delta Lake transaction-log interop for [[Snapshots]] tables — the
  * format bridge to the reference's storage layer (its tables are Delta:
  * analytics/spark/jobs/silver_orders.py:72-84,
  * analytics/spark/conf/spark-defaults.conf:5-10). Two halves, both
  * speaking the PUBLIC Delta protocol (delta.io PROTOCOL.md, JSON commit
  * files only — no checkpoint required for correctness):
  *
  *  - '''Writer''' ([[sync]]): materializes `_delta_log/%020d.json`
  *    commits alongside the graft manifest log, one per committed
  *    snapshot version, so an EXTERNAL Delta reader (Spark+delta,
  *    duckdb delta_scan, delta-rs) can open the table directly. Graft
  *    version v maps to Delta commit v−1 (Delta logs are 0-based).
  *    Commit 0 carries `protocol` (reader 1 / writer 2 — no table
  *    features used) and `metaData` (id, parquet format, Spark-JSON
  *    `schemaString`, no partition columns); later commits re-emit
  *    `metaData` only when the snapshot schema actually changed (the
  *    Delta schema-evolution idiom). File deltas come from manifest
  *    set-difference: a rewrite commit emits `remove` for every parent
  *    file plus `add` for its own; an append emits only `add`s — so the
  *    Delta view of history is file-for-file the manifest view.
  *
  *  - '''Reader''' ([[read]]/[[readAt]]): replays an externally-written
  *    checkpointless Delta log — line-delimited JSON actions, `add`
  *    activating a file, `remove` retiring it (last action per path
  *    wins), `metaData` carrying the schema, unknown actions
  *    (`commitInfo`, `txn`, …) skipped — and reads the active file set
  *    with the declared schema pinned. Scope is the straightforward
  *    log an unpartitioned single-writer table produces: reader
  *    protocol ≤ 1, no partition columns, relative paths (the table
  *    layouts this library writes and the common external case);
  *    anything else fails loudly rather than returning wrong rows.
  *
  * Scale posture: everything here is file-granularity metadata — one
  * JSON line per file per commit, schema reads touch parquet FOOTERS
  * only — bounded by layout, never data size. Sync is idempotent
  * (commits already on disk are never rewritten; the JSON rename is the
  * same atomic-move commit point the manifest uses), so it can run
  * after every [[Snapshots]] commit or once at publish time.
  */
object DeltaLog {

  private val mapper = new ObjectMapper()

  private def logDir(root: String): Path = Paths.get(root, "_delta_log")
  private def commitName(v: Long): String = f"$v%020d.json"
  private def versionOf(name: String): Long =
    name.stripSuffix(".json").toLong

  /** Delta commit versions present in `_delta_log`, ascending. */
  def versions(root: String): Seq[Long] = {
    val log = logDir(root)
    if (!Files.isDirectory(log)) Seq.empty
    else {
      val s = Files.list(log)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.length == 25 && n.endsWith(".json")
          && n.dropRight(5).forall(_.isDigit))
        .map(versionOf).toSeq.sorted
      finally s.close()
    }
  }

  /** Highest Delta commit version; −1 if no log exists. */
  def currentVersion(root: String): Long =
    versions(root).lastOption.getOrElse(-1L)

  // ------------------------------------------------------------------
  // Writer: graft manifest log → _delta_log
  // ------------------------------------------------------------------

  /** Write every missing `_delta_log` commit for `root`'s committed
    * snapshot versions. Returns the highest Delta version present
    * afterwards. Idempotent: existing commit files are left untouched
    * (they are immutable once renamed in, like the manifests).
    */
  def sync(spark: SparkSession, root: String): Long = {
    val gvs = Snapshots.versions(root)
    require(gvs.nonEmpty, s"DeltaLog.sync: no committed snapshots at $root")
    Files.createDirectories(logDir(root))
    // Deterministic table id: stable across re-syncs of the same root.
    val tableId = java.util.UUID.nameUUIDFromBytes(
      ("graft-delta:" + root).getBytes("UTF-8")).toString
    var prevFiles: Seq[String] = Seq.empty
    var prevSchema: String = null
    gvs.foreach { gv =>
      val dv = gv - 1
      val files = Snapshots.manifestFiles(root, gv)
      val schemaJson = spark.read
        .parquet(files.map(f => Paths.get(root, f).toString): _*)
        .schema.json
      val target = logDir(root).resolve(commitName(dv))
      if (!Files.exists(target)) {
        val actions = Seq.newBuilder[JsonNode]
        if (dv == 0L) {
          val protocol = mapper.createObjectNode()
          val p = protocol.putObject("protocol")
          p.put("minReaderVersion", 1)
          p.put("minWriterVersion", 2)
          actions += protocol
        }
        if (dv == 0L || schemaJson != prevSchema)
          actions += metaDataAction(tableId, schemaJson)
        val removed = prevFiles.filterNot(files.contains)
        val added = files.filterNot(prevFiles.contains)
        removed.foreach { f =>
          val n = mapper.createObjectNode()
          val r = n.putObject("remove")
          r.put("path", f)
          r.put("deletionTimestamp", Snapshots.commitTimeMillis(root, gv))
          r.put("dataChange", true)
          actions += n
        }
        added.foreach { f =>
          val fp = Paths.get(root, f)
          val n = mapper.createObjectNode()
          val a = n.putObject("add")
          a.put("path", f)
          a.putObject("partitionValues")
          a.put("size", Files.size(fp))
          a.put("modificationTime", Files.getLastModifiedTime(fp).toMillis)
          a.put("dataChange", true)
          actions += n
        }
        val body = actions.result()
          .map(mapper.writeValueAsString).mkString("", "\n", "\n")
        val tmp = logDir(root).resolve(commitName(dv) + ".__tmp")
        Files.write(tmp, body.getBytes("UTF-8"))
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      }
      prevFiles = files
      prevSchema = schemaJson
    }
    currentVersion(root)
  }

  private def metaDataAction(tableId: String, schemaJson: String): JsonNode = {
    val n = mapper.createObjectNode()
    val m = n.putObject("metaData")
    m.put("id", tableId)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", schemaJson)
    m.putArray("partitionColumns")
    m.putObject("configuration")
    n
  }

  // ------------------------------------------------------------------
  // Reader: _delta_log → DataFrame
  // ------------------------------------------------------------------

  /** Replayed log state at a version: declared schema (if any metaData
    * was seen) and the active table-relative file paths in first-add
    * order.
    */
  private case class LogState(schema: Option[StructType], files: Seq[String])

  private def replay(root: String, upTo: Long): LogState = {
    val present = versions(root)
    require(present.nonEmpty, s"DeltaLog: no _delta_log at $root")
    require(present.contains(upTo),
      s"DeltaLog: version $upTo of $root does not exist (have ${present.mkString(",")})")
    // A checkpointless log must be contiguous from 0 — a gap means a
    // checkpoint-compacted prefix this reader doesn't consume.
    val needed = 0L.to(upTo)
    needed.foreach(v => require(present.contains(v),
      s"DeltaLog: commit $v missing from $root — checkpointed logs unsupported"))
    var schema: Option[StructType] = None
    val active = new java.util.LinkedHashSet[String]()
    needed.foreach { v =>
      val lines = Files.readAllLines(logDir(root).resolve(commitName(v)))
        .asScala.filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("protocol")) {
          val mrv = node.get("protocol").path("minReaderVersion").asInt(1)
          require(mrv <= 1,
            s"DeltaLog: minReaderVersion $mrv needs table features this reader lacks")
        } else if (node.has("metaData")) {
          val md = node.get("metaData")
          val pc = md.path("partitionColumns")
          require(!pc.isArray || pc.size() == 0,
            "DeltaLog: partitioned Delta tables unsupported")
          val provider = md.path("format").path("provider").asText("parquet")
          require(provider == "parquet",
            s"DeltaLog: format provider '$provider' unsupported")
          val ss = md.path("schemaString").asText(null)
          if (ss != null)
            schema = Some(DataType.fromJson(ss).asInstanceOf[StructType])
        } else if (node.has("add")) {
          active.add(decodePath(node.get("add").path("path").asText()))
        } else if (node.has("remove")) {
          active.remove(decodePath(node.get("remove").path("path").asText()))
        }
        // commitInfo / txn / cdc / domainMetadata: ignored by design
      }
    }
    LogState(schema, active.iterator().asScala.toSeq)
  }

  /** Delta `path` fields are URL-encoded relative paths (PROTOCOL.md);
    * percent-escapes decode, absolute URIs are out of scope.
    */
  private def decodePath(raw: String): String = {
    val decoded =
      try {
        val u = new java.net.URI(raw)
        require(u.getScheme == null,
          s"DeltaLog: absolute file URI '$raw' unsupported (relative paths only)")
        u.getPath
      } catch { case _: java.net.URISyntaxException => raw }
    require(!decoded.startsWith("/"),
      s"DeltaLog: absolute path '$raw' unsupported (relative paths only)")
    decoded
  }

  /** Read the table AT Delta commit `version`, via the Delta log alone
    * (the graft manifest is never consulted) — both the external-table
    * ingest path and the round-trip check that [[sync]]'s log means
    * what the manifest meant. The schema is pinned from the log's
    * `metaData`, so an empty active set still returns the declared
    * shape (and mixed-footer unions resolve the Delta way: declared
    * schema wins).
    */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val st = replay(root, version)
    val schema = st.schema.getOrElse(throw new IllegalStateException(
      s"DeltaLog: no metaData action in $root log — schema unknown"))
    if (st.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema)
        .parquet(st.files.map(f => Paths.get(root, f).toString): _*)
  }

  /** Read the current snapshot (highest Delta commit). */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, currentVersion(root))

  /** Active table-relative files at `version` — the planning surface an
    * external integration scans (exposed for specs and manifests).
    */
  def filesAt(root: String, version: Long): Seq[String] =
    replay(root, version).files
}
