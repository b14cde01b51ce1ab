package graft.streaming

import graft.lake.DeltaLog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead,
  SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo,
  PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured-Streaming SOURCE over the graft Delta log — the
  * `spark.readStream.format("graft.streaming.DeltaStreamProvider")
  * .option("path", root)` surface (Delta's own streaming-source shape;
  * the reference consumes its tables the same way:
  * analytics/spark/jobs/silver_orders.py reads a Delta source stream).
  *
  * DataSource V2, micro-batch only. OFFSETS ARE LOG VERSIONS: a batch
  * is the half-open commit range `(start, end]`, so offsets are
  * deterministic, replayable and exactly-once under checkpoint
  * recovery — the engine persists them in the offset log and re-plans
  * the identical file set on restart ([[DeltaLog.appendedFilesIn]],
  * the same loud append-tail contract as `readAppendsSince`:
  * OPTIMIZE's dataChange=false commits skip; DML in the tail refuses).
  *
  * Scale: one InputPartition per appended file — reading parallelizes
  * across executors up to the append width; no driver row handling.
  * Each reader walks its parquet file's row groups directly
  * (parquet-hadoop Group API — no egress, no extra deps) and converts
  * to InternalRow by the DECLARED schema: file-missing columns read
  * null (schema evolution); atomic types plus struct/array/map
  * nestings of them (the silver `items array<struct>` shape) —
  * decimal refuses loudly at scan build.
  *
  * `option("startingVersion", v)` starts the FIRST run after commit v
  * (default −1 = from table creation); `option("startingTimestamp",
  * epochMillis)` instead streams from the first commit AT or AFTER
  * the bound (ICT-aware, mutually exclusive with startingVersion; a
  * bound past retained history streams only future commits);
  * `maxVersionsPerTrigger` bounds
  * each batch's commit range; `maxFilesPerTrigger` /
  * `maxBytesPerTrigger` rate at FILE granularity via a sub-commit
  * offset, so one fat commit (compaction, backfill) drains across
  * several micro-batches (at most one of the three);
  * `readChangeFeed=true` streams the CHANGE FEED instead (cdc files
  * with their own `_change_type`, synthesized inserts,
  * `_commit_version` constants). Partitioned tables stream with typed
  * partition-value constants; column-mapped tables resolve by
  * physical name (name mode) or footer field ids (id mode) at every
  * nesting level.
  */
class DeltaStreamProvider extends TableProvider {

  // the WRITE path hands us the query's schema directly (the sink may
  // CREATE the table); reads without a user schema still infer
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (schema, _) = DeltaLog.tableMeta(SparkSession.active,
      DeltaStreamProvider.rootOf(options))
    if (options.getBoolean("readChangeFeed", false))
      schema.add("_change_type", StringType)
        .add("_commit_version", LongType)
    else schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val root = properties.get("path")
    require(root != null,
      "DeltaStreamProvider: option(\"path\", <table root>) is required")
    val explicitVersion =
      Option(properties.get("startingversion"))
        .orElse(Option(properties.get("startingVersion")))
        .map(_.toLong)
    val startingTs =
      Option(properties.get("startingtimestamp"))
        .orElse(Option(properties.get("startingTimestamp")))
        .map(_.toLong)
    require(explicitVersion.isEmpty || startingTs.isEmpty,
      "DeltaStreamProvider: startingVersion and startingTimestamp are " +
        "mutually exclusive")
    val startingVersion = startingTs match {
      // Delta's startingTimestamp rule: changes stream FROM the first
      // commit at or after the bound (the offset is exclusive, hence
      // the -1); a bound past the retained history streams only what
      // arrives next
      case Some(ts) => DeltaLog.firstVersionAtOrAfter(root, ts)
        .map(_ - 1L).getOrElse(DeltaLog.currentVersion(root))
      case None => explicitVersion.getOrElse(-1L)
    }
    def longOpt(lower: String, camel: String): Option[Long] =
      Option(properties.get(lower))
        .orElse(Option(properties.get(camel))).map(_.toLong)
    val admission = DeltaAdmission(
      longOpt("maxversionspertrigger", "maxVersionsPerTrigger"),
      longOpt("maxfilespertrigger", "maxFilesPerTrigger"),
      longOpt("maxbytespertrigger", "maxBytesPerTrigger"))
    val cdf = Option(properties.get("readchangefeed"))
      .orElse(Option(properties.get("readChangeFeed")))
      .exists(_.trim.equalsIgnoreCase("true"))
    new DeltaStreamTable(root, schema, startingVersion, admission, cdf)
  }
}

object DeltaStreamProvider {
  private[streaming] def rootOf(options: CaseInsensitiveStringMap): String = {
    val root = options.get("path")
    require(root != null,
      "DeltaStreamProvider: option(\"path\", <table root>) is required")
    root
  }
}

private[streaming] class DeltaStreamTable(root: String, schema0: StructType,
                                          startingVersion: Long,
                                          admission: DeltaAdmission,
                                          cdf: Boolean = false)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft-delta `$root`"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] = {
    val set = new java.util.HashSet[TableCapability]()
    set.add(TableCapability.MICRO_BATCH_READ)
    set.add(TableCapability.STREAMING_WRITE)
    set
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = {
          info.schema().fields.foreach(f => require(
            DeltaStreamReaderFactory.readSupported(f.dataType),
            s"DeltaStreamProvider sink: column ${f.name} has type " +
              s"${f.dataType} — the sink writes atomic types and " +
              "struct/array/map nestings of them"))
          // an EXISTING table dictates the partitioning (rows route to
          // partition directories executor-side); a table the sink
          // CREATES is flat
          val exists = DeltaLog.versions(root).nonEmpty
          val (declared, pcs): (Option[StructType], Seq[String]) =
            if (exists) {
              val (sch, p) = DeltaLog.tableMeta(SparkSession.active, root)
              (Some(sch), p)
            } else (None, Seq.empty)
          // mapped sinks stage files under the table's DECLARED
          // physical names (+field ids in id mode) AT EVERY NESTING
          // LEVEL: the declared schema carries the mapping in field
          // metadata, so it becomes the writer's naming source —
          // nested struct/array/map columns stream into mapped tables
          // the same way they do into unmapped ones (q293 × q289/q290)
          val (physNames, fieldIds) =
            if (exists) DeltaLog.columnResolution(SparkSession.active, root)
            else (Map.empty[String, String], Map.empty[String, Long])
          val mapped = physNames.nonEmpty || fieldIds.nonEmpty
          val writeSchema: StructType =
            if (!mapped) info.schema()
            else {
              val d = declared.get
              // shape must match EXACTLY (names, order, types modulo
              // nullability/metadata): the writer stages rows by the
              // declared schema's positions, and a mismatch would
              // otherwise surface as an executor ClassCastException
              // instead of this message
              require(DeltaLog.normSchema(d) ==
                  DeltaLog.normSchema(info.schema()),
                s"DeltaStreamProvider sink: the stream's schema " +
                  s"${info.schema()} does not match the mapped table's " +
                  s"declared shape $d")
              d
            }
          pcs.foreach { c =>
            require(info.schema().fieldNames.contains(c),
              s"DeltaStreamProvider sink: partition column $c missing " +
                "from the stream's schema")
            require(DeltaStreamReaderFactory.pvSupported(
              info.schema()(c).dataType),
              s"DeltaStreamProvider sink: partition column $c has type " +
                s"${info.schema()(c).dataType} — supported partition " +
                "types are long/int/string/boolean/double/date")
          }
          new DeltaStreamingWrite(root, info.schema(), info.queryId(),
            pcs, writeSchema, stampIds = fieldIds.nonEmpty)
        }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def description(): String = name()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          val (_, pcs) = DeltaLog.tableMeta(SparkSession.active, root)
          // the reader opens data files DIRECTLY — on a mapped table it
          // resolves columns by physical name (name mode) or by the
          // footer's field ids (id mode) via this resolution pair
          val (lookupNames, fieldIds) =
            DeltaLog.columnResolution(SparkSession.active, root)
          if (cdf) require(
            DeltaLog.changeFeedEnabled(SparkSession.active, root),
            s"DeltaStreamProvider: $root does not declare " +
              "delta.enableChangeDataFeed — no change feed to stream")
          schema0.fields.foreach(f => require(
            DeltaStreamReaderFactory.readSupported(f.dataType),
            s"DeltaStreamProvider: column ${f.name} has type " +
              s"${f.dataType} — streaming reads support atomic types " +
              "and struct/array/map nestings of them"))
          pcs.foreach { c =>
            require(schema0.fieldNames.contains(c),
              s"DeltaStreamProvider: partition column $c missing from " +
                "the declared schema")
            require(DeltaStreamReaderFactory.pvSupported(
              schema0(c).dataType),
              s"DeltaStreamProvider: partition column $c has type " +
                s"${schema0(c).dataType} — supported partition types " +
                "are long/int/string/boolean/double/date")
          }
          new DeltaMicroBatchStream(root, schema0, startingVersion,
            admission, pcs, cdf, lookupNames, fieldIds)
        }
      }
    }
}

/** A streaming offset at SUB-COMMIT granularity: commits `<= version`
  * fully consumed, plus the first `index` files of commit
  * `version + 1` (per-commit file order is deterministic — commit-JSON
  * line order — so a restart replays identical slices). `index == 0`
  * serializes as the bare version number, byte-identical to the
  * version-granular offsets older checkpoints recorded, so existing
  * streams resume unchanged; partial offsets serialize as a JSON
  * object.
  */
private[streaming] case class VersionOffset(version: Long,
                                            index: Long = 0L) extends Offset {
  override def json(): String =
    if (index == 0L) version.toString
    else s"""{"version":$version,"index":$index}"""
}

private[streaming] object VersionOffset {
  def parse(json: String): VersionOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
      VersionOffset(n.path("version").asLong(), n.path("index").asLong())
    } else VersionOffset(t.toLong)
  }
}

/** Version-capped admission: `maxVersionsPerTrigger` bounds how many
  * commits one micro-batch may drain — the first start against a long
  * backlog proceeds in bounded batches instead of planning one giant
  * one, and every intermediate batch is a replayable (start, end]
  * range like any other.
  */
private[streaming] case class ReadMaxVersions(n: Long) extends ReadLimit

/** File/byte-capped admission (`maxFilesPerTrigger` /
  * `maxBytesPerTrigger`, Delta's own rate-limit options): a single FAT
  * commit — a compaction, a bulk backfill — splits across micro-batches
  * at file granularity via the sub-commit offset, instead of landing
  * in one giant batch no matter the limit. Sizes come from the adds'
  * recorded `size` field (zero extra IO). A batch always admits at
  * least one file, so a file larger than the byte budget still drains.
  */
private[streaming] case class ReadMaxFilesG(n: Long) extends ReadLimit
private[streaming] case class ReadMaxBytesG(n: Long) extends ReadLimit

/** The three per-trigger admission options (at most one set). */
private[streaming] case class DeltaAdmission(maxVersions: Option[Long],
                                             maxFiles: Option[Long],
                                             maxBytes: Option[Long]) {
  require(Seq(maxVersions, maxFiles, maxBytes).count(_.nonEmpty) <= 1,
    "DeltaStreamProvider: at most one of maxVersionsPerTrigger / " +
      "maxFilesPerTrigger / maxBytesPerTrigger")
  Seq("maxVersionsPerTrigger" -> maxVersions, "maxFilesPerTrigger" -> maxFiles,
    "maxBytesPerTrigger" -> maxBytes).foreach { case (name, v) =>
    v.foreach(n => require(n >= 1, s"DeltaStreamProvider: $name >= 1, got $n"))
  }
  def readLimit: ReadLimit =
    maxVersions.map(ReadMaxVersions(_): ReadLimit)
      .orElse(maxFiles.map(ReadMaxFilesG(_): ReadLimit))
      .orElse(maxBytes.map(ReadMaxBytesG(_): ReadLimit))
      .getOrElse(ReadLimit.allAvailable())
}

private[streaming] class DeltaMicroBatchStream(root: String,
                                               schema: StructType,
                                               startingVersion: Long,
                                               admission: DeltaAdmission,
                                               partitionCols: Seq[String],
                                               cdf: Boolean = false,
                                               lookupNames: Map[String, String] = Map.empty,
                                               fieldIds: Map[String, Long] = Map.empty)
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = VersionOffset(startingVersion)

  override def getDefaultReadLimit: ReadLimit = admission.readLimit

  /** Ordered file list of ONE commit — (relative path, partition
    * values, reader extras, recorded size). Deterministic across
    * restarts (commit-JSON line order): both admission control and
    * planning paginate by position into this list. A one-entry memo
    * (draining is sequential: admission and planning revisit the SAME
    * fat commit every trigger) keeps file-granular rate limiting
    * O(commit) instead of O(commit²) in JSON re-parses.
    */
  private var commitFilesMemo: (Long, Seq[(String, Map[String, String], Map[String, String], Long)]) =
    (Long.MinValue, Seq.empty)

  private def commitFiles(v: Long): Seq[(String, Map[String, String], Map[String, String], Long)] =
    synchronized {
      if (commitFilesMemo._1 != v)
        commitFilesMemo = (v, commitFilesUncached(v))
      commitFilesMemo._2
    }

  private def commitFilesUncached(v: Long): Seq[(String, Map[String, String], Map[String, String], Long)] =
    if (cdf)
      DeltaLog.changeFilesIn(root, v - 1, v).map { case (_, rel, pv, ct, sz) =>
        (rel, pv, Map("_commit_version" -> v.toString) ++
          ct.map("_change_type" -> _), sz)
      }
    else
      DeltaLog.appendedFilesIn(root, v - 1, v).map { case (_, rel, pv, sz) =>
        (rel, pv, Map.empty[String, String], sz)
      }

  /** Walk commits from `so`, admitting whole commits while the
    * file/byte budget holds and stopping MID-COMMIT (a sub-commit
    * offset) when it does not. Zero-file commits (metadata-only,
    * empty appends) pass through freely; the first file of a batch is
    * always admitted so progress is guaranteed.
    */
  private def admitBounded(so: VersionOffset, cur: Long,
                           maxFiles: Long, maxBytes: Long): VersionOffset = {
    var v = so.version + 1
    var idx = so.index.toInt
    var files = 0L
    var bytes = 0L
    var out = so
    var done = false
    while (!done && v <= cur) {
      val fs = commitFiles(v)
      var i = idx
      while (!done && i < fs.size) {
        val sz = fs(i)._4
        if (files + 1 > maxFiles || (bytes + sz > maxBytes && files > 0))
          done = true
        else { files += 1; bytes += sz; i += 1 }
      }
      if (i > idx || i >= fs.size)
        out = if (i >= fs.size) VersionOffset(v, 0L)
        else VersionOffset(v - 1, i.toLong)
      if (i >= fs.size) { v += 1; idx = 0 } else done = true
    }
    out
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = DeltaLog.currentVersion(root)
    val so = start.asInstanceOf[VersionOffset]
    limit match {
      case ReadMaxVersions(n) =>
        VersionOffset(math.min(cur, so.version + n))
      case ReadMaxFilesG(n) => admitBounded(so, cur, n, Long.MaxValue)
      case ReadMaxBytesG(n) => admitBounded(so, cur, Long.MaxValue, n)
      case _ => VersionOffset(cur)
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this admission-aware source")

  override def deserializeOffset(json: String): Offset =
    VersionOffset.parse(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset]
    val e = end.asInstanceOf[VersionOffset]
    val lastV = if (e.index > 0L) e.version + 1 else e.version
    val out = Array.newBuilder[InputPartition]
    var v = s.version + 1
    while (v <= lastV) {
      val fs = commitFiles(v)
      val from = if (v == s.version + 1) s.index.toInt else 0
      val until = if (e.index > 0L && v == e.version + 1) e.index.toInt
      else fs.size
      var i = from
      while (i < until) {
        val (rel, pv, extras, _) = fs(i)
        out += DeltaFilePartition(
          java.nio.file.Paths.get(root, rel).toString, pv, extras)
        i += 1
      }
      v += 1
    }
    out.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the session's resolved hadoop conf (the countFast pattern:
    // a bare `new Configuration()` in the task would lose FS settings)
    val it = SparkSession.active.sparkContext.hadoopConfiguration.iterator()
    val props = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); props += ((e.getKey, e.getValue)) }
    DeltaStreamReaderFactory(schema.json, props.toArray,
      partitionCols.toArray, lookupNames, fieldIds)
  }
}

private[streaming] case class DeltaFilePartition(
    path: String, partitionValues: Map[String, String],
    extras: Map[String, String] = Map.empty)
  extends InputPartition

private[streaming] case class DeltaStreamReaderFactory(
    schemaJson: String, hadoopProps: Array[(String, String)],
    partitionCols: Array[String],
    lookupNames: Map[String, String] = Map.empty,
    fieldIds: Map[String, Long] = Map.empty)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => conf.set(k, v) }
    val p = partition.asInstanceOf[DeltaFilePartition]
    val declared = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    // partition columns read as per-file CONSTANTS from the add's
    // partitionValues (keyed PHYSICAL on mapped tables, logical
    // accepted as a fallback), parsed once per reader by declared type
    val pcSet = partitionCols.toSet
    val constants: Array[Option[Any]] = declared.fields.map { f =>
      if (pcSet(f.name)) {
        val key = lookupNames.getOrElse(f.name, f.name)
        Some(DeltaStreamReaderFactory.parsePv(
          p.partitionValues.get(key)
            .orElse(p.partitionValues.get(f.name)).orNull, f.dataType))
      } else if (p.extras.contains(f.name))
        Some(DeltaStreamReaderFactory.parsePv(
          p.extras(f.name), f.dataType))
      else None
    }
    val lookups = declared.fields.map(f =>
      lookupNames.getOrElse(f.name, f.name))
    val ids = declared.fields.map(f => fieldIds.get(f.name))
    new GroupParquetReader(p.path, declared, constants, conf,
      lookups, ids)
  }
}

private[streaming] object DeltaStreamReaderFactory {
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
         StringType | BinaryType | TimestampType | DateType => true
    case _ => false
  }

  /** Nested type support, BOTH directions: struct/array/map over
    * supported atoms stream through the source's Group walk AND the
    * sink's Group staging (the reference's silver nests
    * `items array<struct<...>>`) — including column-mapped sinks,
    * which stage under declared physical names/field ids at every
    * level. [[supported]] is the atomic subset.
    */
  def readSupported(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.forall(f => readSupported(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType =>
      readSupported(a.elementType)
    case m: org.apache.spark.sql.types.MapType =>
      readSupported(m.keyType) && readSupported(m.valueType)
    case other => supported(other)
  }

  def pvSupported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType | BooleanType | DoubleType |
         DateType => true
    case _ => false
  }

  /** Delta partition-value string → Spark internal representation. */
  def parsePv(raw: String, dt: DataType): Any =
    if (raw == null) null
    else dt match {
      case LongType => raw.toLong
      case IntegerType => raw.toInt
      case DoubleType => raw.toDouble
      case BooleanType => raw.toBoolean
      case StringType => UTF8String.fromString(raw)
      case DateType => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case other => throw new IllegalArgumentException(
        s"DeltaStreamReaderFactory: partition type $other unsupported")
    }
}

/** Row-group walk of ONE parquet file via the parquet-hadoop Group API,
  * converting to InternalRow by the declared schema: file-missing
  * columns → null (post-evolution reads), value extraction by declared
  * Spark type (timestamps must be INT64 µs — the only physical form
  * this bridge writes; INT96 refuses loudly). Column-mapped tables
  * resolve each field by its parquet FIELD ID when one is declared
  * (id mode), else by `lookupNames` (the physical name under name
  * mode, the logical name otherwise).
  */
private[streaming] class GroupParquetReader(
    path: String, declared: StructType, constants: Array[Option[Any]],
    conf: org.apache.hadoop.conf.Configuration,
    lookupNames: Array[String] = Array.empty,
    fieldIds: Array[Option[Long]] = Array.empty)
  extends PartitionReader[InternalRow] {

  import org.apache.parquet.example.data.Group
  import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.io.ColumnIOFactory
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

  private val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
    new org.apache.hadoop.fs.Path(path), conf))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val io = new ColumnIOFactory().getColumnIO(fileSchema)
  private val fieldIdx: Array[Int] = declared.fields.zipWithIndex.map {
    case (f, di) =>
    if (constants(di).isDefined) -1
    else {
      val byId: Option[Int] =
        if (di < fieldIds.length) fieldIds(di).flatMap { id =>
          (0 until fileSchema.getFieldCount).find { i =>
            val t = fileSchema.getType(i)
            t.getId != null && t.getId.intValue().toLong == id
          }
        } else None
      val name = if (di < lookupNames.length) lookupNames(di) else f.name
      val idx = byId.getOrElse(
        if (fileSchema.containsField(name)) fileSchema.getFieldIndex(name)
        else -1)
      if (idx >= 0 && f.dataType == TimestampType) {
        val pt = fileSchema.getType(idx).asPrimitiveType()
        require(pt.getPrimitiveTypeName == PrimitiveTypeName.INT64,
          s"GroupParquetReader: $path stores ${f.name} as " +
            s"${pt.getPrimitiveTypeName}, expected INT64 µs timestamps")
      }
      idx
    }
  }

  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var remaining = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (remaining == 0L) {
      val store = reader.readNextRowGroup()
      if (store == null) return false
      remaining = store.getRowCount
      recordReader = io.getRecordReader(store,
        new GroupRecordConverter(fileSchema))
    }
    val g = recordReader.read()
    remaining -= 1
    current = toRow(g)
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = reader.close()

  private def toRow(g: Group): InternalRow = {
    val values = new Array[Any](declared.length)
    var i = 0
    while (i < declared.length) {
      val idx = fieldIdx(i)
      values(i) =
        if (constants(i).isDefined) constants(i).get
        else if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
        else convertValue(g, idx, 0, declared.fields(i).dataType)
      i += 1
    }
    new GenericInternalRow(values)
  }

  private val PhysNameKey = "delta.columnMapping.physicalName"
  private val ColIdKey = "delta.columnMapping.id"

  /** Resolve a declared NESTED field inside a file group type: by the
    * declared column-mapping FIELD ID when both sides carry one (id
    * mode — stored names are not authoritative), else by physicalName
    * (name mode), else by the logical name. −1 = absent (reads null,
    * the evolution rule, same as top level).
    */
  private def resolveIn(gt: org.apache.parquet.schema.GroupType,
                        f: org.apache.spark.sql.types.StructField): Int = {
    val byId: Option[Int] =
      if (f.metadata.contains(ColIdKey)) {
        val id = f.metadata.getLong(ColIdKey)
        (0 until gt.getFieldCount).find { i =>
          val t = gt.getType(i)
          t.getId != null && t.getId.intValue().toLong == id
        }
      } else None
    val name = if (f.metadata.contains(PhysNameKey))
      f.metadata.getString(PhysNameKey) else f.name
    byId.getOrElse(
      if (gt.containsField(name)) gt.getFieldIndex(name) else -1)
  }

  private def structRow(g: Group,
      st: StructType): InternalRow = {
    val gt = g.getType
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      val idx = resolveIn(gt, st.fields(i))
      vals(i) =
        if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
        else convertValue(g, idx, 0, st.fields(i).dataType)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  /** Field `idx`, repetition `rep` of `g` as the Spark-internal value
    * of `dt` — recursive over struct/array/map (parquet LIST in both
    * the standard 3-level and the legacy element-direct shapes,
    * disambiguated by the format's backward-compat rule; MAP as the
    * standard repeated key_value).
    */
  /** The file-side primitive type of field `idx` in group `g` (the
    * widening dispatch needs the PHYSICAL form, not the declared one).
    */
  private def primitiveOf(g: Group, idx: Int): PrimitiveTypeName =
    g.getType.getType(idx).asPrimitiveType().getPrimitiveTypeName

  private def convertValue(g: Group, idx: Int, rep: Int,
                           dt: DataType): Any = dt match {
    case st: StructType => structRow(g.getGroup(idx, rep), st)
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      val lg = g.getGroup(idx, rep)
      val repeated = lg.getType.getType(0)
      val n = lg.getFieldRepetitionCount(0)
      val out = new Array[Any](n)
      // LogicalTypes.md backward-compat rule: a repeated PRIMITIVE, a
      // repeated group with >1 fields, or one named array/..._tuple IS
      // the element; otherwise it is the 3-level "list" wrapper
      val elementDirect = repeated.isPrimitive ||
        repeated.asGroupType().getFieldCount > 1 ||
        repeated.getName == "array" || repeated.getName.endsWith("_tuple")
      var i = 0
      while (i < n) {
        out(i) =
          if (elementDirect) convertValue(lg, 0, i, et)
          else {
            val w = lg.getGroup(0, i)
            if (w.getFieldRepetitionCount(0) == 0) null
            else convertValue(w, 0, 0, et)
          }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    case org.apache.spark.sql.types.MapType(kt, vt, _) =>
      val mg = g.getGroup(idx, rep)
      val n = mg.getFieldRepetitionCount(0)
      val ks = new Array[Any](n)
      val vs = new Array[Any](n)
      var i = 0
      while (i < n) {
        val kv = mg.getGroup(0, i)
        ks(i) = convertValue(kv, 0, 0, kt)
        vs(i) =
          if (kv.getFieldRepetitionCount(1) == 0) null
          else convertValue(kv, 1, 0, vt)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ks),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vs))
    case LongType =>
      // typeWidening: files written before an int→long widening store
      // INT32 — extract by the file's OWN physical form and upcast
      primitiveOf(g, idx) match {
        case PrimitiveTypeName.INT32 => g.getInteger(idx, rep).toLong
        case _ => g.getLong(idx, rep)
      }
    case TimestampType => g.getLong(idx, rep)
    case IntegerType | DateType => g.getInteger(idx, rep)
    case DoubleType =>
      primitiveOf(g, idx) match {
        case PrimitiveTypeName.FLOAT => g.getFloat(idx, rep).toDouble
        case _ => g.getDouble(idx, rep)
      }
    case FloatType => g.getFloat(idx, rep)
    case BooleanType => g.getBoolean(idx, rep)
    case StringType =>
      UTF8String.fromBytes(g.getBinary(idx, rep).getBytes)
    case BinaryType => g.getBinary(idx, rep).getBytes
    case other => throw new IllegalStateException(
      s"GroupParquetReader: unsupported type $other (vetted at " +
        "scan build — unreachable)")
  }
}

/** Exactly-once DSv2 streaming SINK into the Delta log: executors
  * write each task's rows to staged parquet parts under the table's
  * same-filesystem staging dir — one part per TABLE PARTITION VALUE
  * the task holds (rows route executor-side; partition columns are
  * carried as directory metadata, never stored in the file) — and the
  * DRIVER's epoch commit moves the staged files into their partition
  * directories and writes ONE log commit carrying a `txn` watermark
  * (appId = the query id) — a replayed epoch after recovery is a
  * no-op, the Delta idempotent-writer pattern. Appends only (the
  * streaming-sink shape); `abort` discards the epoch's staged files.
  */
private[streaming] class DeltaStreamingWrite(root: String,
                                             schema: StructType,
                                             queryId: String,
                                             partitionCols: Seq[String],
                                             writeSchema: StructType,
                                             stampIds: Boolean = false)
  extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val it = SparkSession.active.sparkContext.hadoopConfiguration.iterator()
    val props = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); props += ((e.getKey, e.getValue)) }
    // materialize the staging dir BEFORE executors need it
    val staging = DeltaLog.streamStagingDir(root)
    // the WRITE schema (the table's declared schema on a mapped
    // table — its field metadata names the staged parquet columns at
    // every level) ships as JSON; StructType.json round-trips metadata
    DeltaStreamWriterFactory(staging.toString, writeSchema.json,
      partitionCols, props.toArray, stampIds)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect {
      case DeltaWriteMessage(files) => files.map { case (p, pv) =>
        java.nio.file.Paths.get(p) -> pv }
    }.toSeq.flatten
    DeltaLog.commitStreamFiles(SparkSession.active, root, schema.json,
      staged, (s"graft-stream-sink-$queryId", epochId), partitionCols)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case DeltaWriteMessage(files) => files.foreach { case (p, _) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)) }
      case _ => ()
    }
}

/** Staged files of one task: (path, partitionValues) pairs. */
private[streaming] case class DeltaWriteMessage(
    files: Seq[(String, Map[String, String])])
  extends WriterCommitMessage

private[streaming] case class DeltaStreamWriterFactory(
    stagingDir: String, schemaJson: String, partitionCols: Seq[String],
    hadoopProps: Array[(String, String)],
    stampIds: Boolean = false)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => conf.set(k, v) }
    new GroupParquetWriter(stagingDir,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partitionCols, conf, stampIds)
  }
}

/** Staged parquet parts via the parquet-hadoop example writer
  * (lazy-opened: an empty Spark partition stages nothing);
  * declared-schema atomic types plus struct/array/map nestings of
  * them (standard 3-level LIST / key_value MAP shapes, mirrored by
  * [[GroupParquetReader]]'s walk). On a PARTITIONED table rows route
  * executor-side: one staged part per distinct table-partition value
  * this task holds, partition columns extracted per row (Delta string
  * representation) and EXCLUDED from the file — they live in the
  * directory path and the add's partitionValues, like every Delta
  * writer. `commit` hands (path, partitionValues) pairs to the
  * driver; `abort` deletes them all.
  *
  * Column mapping: `schema` is the table's DECLARED schema on a
  * mapped table — each field's `delta.columnMapping.physicalName`
  * names the staged parquet column (identity when absent), and with
  * `stampIds` (id mode) its `delta.columnMapping.id` is recorded as
  * the parquet field id, BOTH recursively at every nesting level
  * (mirroring [[GroupParquetReader.resolveIn]] and the batch write's
  * toPhysicalField).
  */
private[streaming] class GroupParquetWriter(
    stagingDir: String, schema: StructType, partitionCols: Seq[String],
    conf: org.apache.hadoop.conf.Configuration,
    stampIds: Boolean = false)
  extends DataWriter[InternalRow] {

  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.io.api.Binary
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType,
    Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  private val pcSet = partitionCols.toSet
  /** data fields with their index into the FULL row. */
  private val dataFields: Array[(org.apache.spark.sql.types.StructField, Int)] =
    schema.fields.zipWithIndex.filterNot { case (f, _) => pcSet(f.name) }
  private val pcFields: Array[(Int, DataType)] =
    partitionCols.map(c => (schema.fieldIndex(c), schema(c).dataType))
      .toArray
  private val dataSchema = StructType(dataFields.map(_._1))

  /** Parquet type of one field — recursive: structs as optional
    * groups, arrays as the STANDARD 3-level LIST (matching the
    * reader's walk), maps as repeated key_value.
    */
  private def parquetTypeOf(name: String,
      dt: DataType): org.apache.parquet.schema.Type = {
    import org.apache.parquet.schema.{GroupType, Type}
    def prim(ptn: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName,
             ann: LogicalTypeAnnotation = null): Type = {
      var pb = Types.optional(ptn)
      if (ann != null) pb = pb.as(ann)
      pb.named(name)
    }
    dt match {
      case st: StructType =>
        val gb = Types.optionalGroup()
        st.fields.foreach(f2 => gb.addField(fieldTypeOf(f2)))
        gb.named(name)
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        Types.optionalGroup().as(LogicalTypeAnnotation.listType())
          .addField(new GroupType(Type.Repetition.REPEATED, "list",
            parquetTypeOf("element", et)))
          .named(name)
      case org.apache.spark.sql.types.MapType(kt, vt, _) =>
        // the format spec REQUIRES the map key field's repetition to be
        // `required` (Spark map keys are non-null and [[appendField]]
        // always writes them); an optional key reads fine here and in
        // Spark, but strict external readers may reject the file
        Types.optionalGroup().as(LogicalTypeAnnotation.mapType())
          .addField(new GroupType(Type.Repetition.REPEATED, "key_value",
            requiredCopy(parquetTypeOf("key", kt)),
            parquetTypeOf("value", vt)))
          .named(name)
      case LongType => prim(INT64)
      case TimestampType => prim(INT64,
        LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.MICROS))
      case IntegerType => prim(INT32)
      case DateType => prim(INT32, LogicalTypeAnnotation.dateType())
      case DoubleType => prim(DOUBLE)
      case FloatType => prim(FLOAT)
      case BooleanType => prim(BOOLEAN)
      case StringType => prim(BINARY, LogicalTypeAnnotation.stringType())
      case BinaryType => prim(BINARY)
      case other => throw new IllegalArgumentException(
        s"GroupParquetWriter: unsupported type $other (vetted at " +
          "write build — unreachable)")
    }
  }

  /** Same type with `required` repetition (map keys). */
  private def requiredCopy(
      t: org.apache.parquet.schema.Type): org.apache.parquet.schema.Type = {
    import org.apache.parquet.schema.Type
    if (t.isPrimitive) {
      val p = t.asPrimitiveType()
      var b = Types.primitive(p.getPrimitiveTypeName,
        Type.Repetition.REQUIRED)
      if (p.getLogicalTypeAnnotation != null)
        b = b.as(p.getLogicalTypeAnnotation)
      b.named(t.getName)
    } else {
      val g = t.asGroupType()
      var b = Types.buildGroup(Type.Repetition.REQUIRED)
      if (g.getLogicalTypeAnnotation != null)
        b = b.as(g.getLogicalTypeAnnotation)
      g.getFields.forEach(f => b.addField(f))
      b.named(g.getName)
    }
  }

  private val WriterPhysNameKey = "delta.columnMapping.physicalName"
  private val WriterColIdKey = "delta.columnMapping.id"

  /** Parquet type of one STRUCT FIELD (any nesting level): named by its
    * column-mapping physicalName when declared, stamped with its field
    * id under id mode — the write-side mirror of the reader's
    * [[GroupParquetReader.resolveIn]].
    */
  private def fieldTypeOf(
      f: org.apache.spark.sql.types.StructField): org.apache.parquet.schema.Type = {
    val name =
      if (f.metadata.contains(WriterPhysNameKey))
        f.metadata.getString(WriterPhysNameKey)
      else f.name
    val t = parquetTypeOf(name, f.dataType)
    if (stampIds && f.metadata.contains(WriterColIdKey))
      t.withId(f.metadata.getLong(WriterColIdKey).toInt)
    else t
  }

  private val messageType: MessageType = {
    val b = Types.buildMessage()
    dataSchema.fields.foreach(f => b.addField(fieldTypeOf(f)))
    b.named("spark_schema")
  }

  private val factory = new SimpleGroupFactory(messageType)
  private val writers = scala.collection.mutable.LinkedHashMap.empty[
    Seq[Option[String]],
    (org.apache.parquet.hadoop.ParquetWriter[
      org.apache.parquet.example.data.Group], java.nio.file.Path)]

  private def open(): (org.apache.parquet.hadoop.ParquetWriter[
      org.apache.parquet.example.data.Group], java.nio.file.Path) = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(stagingDir))
    val path = java.nio.file.Paths.get(stagingDir,
      s"stream-${java.util.UUID.randomUUID()}.parquet")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path.toString))
      .withType(messageType).withConf(conf).build()
    (w, path)
  }

  /** Delta partition-value strings of one row (None = null value). */
  private def pvOf(row: InternalRow): Seq[Option[String]] =
    pcFields.toSeq.map { case (i, dt) =>
      if (row.isNullAt(i)) None
      else Some(dt match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case StringType => row.getUTF8String(i).toString
        case BooleanType => row.getBoolean(i).toString
        case DoubleType => row.getDouble(i).toString
        case DateType =>
          java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
        case other => throw new IllegalStateException(
          s"GroupParquetWriter: partition type $other — vetted at " +
            "write build, unreachable")
      })
    }

  /** Append field `idx` of `g` from position `i` of `src` (InternalRow
    * and ArrayData share the SpecializedGetters surface, so one
    * recursion covers rows, array elements and map entries). Nested
    * group structure mirrors [[parquetTypeOf]] exactly.
    */
  private def appendField(g: org.apache.parquet.example.data.Group,
      idx: Int, dt: DataType,
      src: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int): Unit = dt match {
    case st: StructType =>
      val child = g.addGroup(idx)
      val row = src.getStruct(i, st.length)
      var j = 0
      while (j < st.length) {
        if (!row.isNullAt(j))
          appendField(child, j, st.fields(j).dataType, row, j)
        j += 1
      }
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      val lg = g.addGroup(idx)
      val arr = src.getArray(i)
      var j = 0
      while (j < arr.numElements()) {
        val w = lg.addGroup(0)
        if (!arr.isNullAt(j)) appendField(w, 0, et, arr, j)
        j += 1
      }
    case org.apache.spark.sql.types.MapType(kt, vt, _) =>
      val mg = g.addGroup(idx)
      val m = src.getMap(i)
      val ks = m.keyArray()
      val vs = m.valueArray()
      var j = 0
      while (j < m.numElements()) {
        val kv = mg.addGroup(0)
        appendField(kv, 0, kt, ks, j)
        if (!vs.isNullAt(j)) appendField(kv, 1, vt, vs, j)
        j += 1
      }
    case LongType | TimestampType => g.add(idx, src.getLong(i))
    case IntegerType | DateType => g.add(idx, src.getInt(i))
    case DoubleType => g.add(idx, src.getDouble(i))
    case FloatType => g.add(idx, src.getFloat(i))
    case BooleanType => g.add(idx, src.getBoolean(i))
    case StringType => g.add(idx,
      Binary.fromConstantByteArray(src.getUTF8String(i).getBytes))
    case BinaryType => g.add(idx,
      Binary.fromConstantByteArray(src.getBinary(i)))
    case other => throw new IllegalStateException(
      s"GroupParquetWriter: unsupported type $other — unreachable")
  }

  override def write(row: InternalRow): Unit = {
    val w = writers.getOrElseUpdate(pvOf(row), open())._1
    val g = factory.newGroup()
    var j = 0
    while (j < dataFields.length) {
      val (f, i) = dataFields(j)
      if (!row.isNullAt(i)) appendField(g, j, f.dataType, row, i)
      j += 1
    }
    w.write(g)
  }

  override def commit(): WriterCommitMessage =
    DeltaWriteMessage(writers.toSeq.map { case (pvKey, (w, path)) =>
      w.close()
      path.toString ->
        partitionCols.zip(pvKey).map { case (c, v) => c -> v.orNull }.toMap
    })

  override def abort(): Unit =
    writers.values.foreach { case (w, path) =>
      w.close()
      java.nio.file.Files.deleteIfExists(path)
    }

  override def close(): Unit = ()
}
