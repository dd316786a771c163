package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types => PTypes}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.Type.Repetition
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.Versioned

/** DataSource V2 surface for the graft version store — the
  * `spark.read.format("graft-versioned")` API a Delta-style consumer
  * expects over [[graft.operators.Versioned]] roots (the reference's
  * versioned-load consumers, price_prediction_data_pipeline.py:140-177,
  * and the restore path, utils_of_backup.py:43-164). Completes the
  * Catalyst extension ladder: expressions → optimizer rules → planner
  * strategies → physical operators → **TableProvider/Scan**.
  *
  * Batch reads resolve a snapshot:
  * {{{
  * spark.read.format("graft-versioned")
  *   .option("versionAsOf", 1)          // or
  *   .option("timestampAsOf", 2500)     // commit-stamp time travel
  *   .load(root)
  * }}}
  * Streaming reads drain the STORED change feed
  * ([[Versioned.writeNextWithFeed]]) version-by-version, each commit one
  * micro-batch — the Delta CDF shape:
  * {{{
  * spark.readStream.format("graft-versioned")
  *   .option("changeFeed", "true").option("startingVersion", 1)
  *   .load(root)
  * }}}
  *
  * The scan is a REAL column-pruning, filter-pushing reader: requested
  * columns become a parquet projection schema (unread columns are never
  * decoded), and supported predicates become parquet `FilterPredicate`s
  * (row-group statistics + dictionary + record-level filtering inside
  * the parquet reader — rows failing a pushed filter are never
  * materialized). One input partition per parquet ROW GROUP
  * ([[GroupParquetIo.splitByRowGroup]]) — files are the durability
  * unit, row groups the parallelism unit, so a compacted 1 GB file
  * still fans out to its groups instead of capping the stage at file
  * count.
  *
  * Writes honor a layout contract: `clusterBy` (write option or
  * catalog TBLPROPERTY) range-clusters + sorts rows through Spark's
  * own planner (`RequiresDistributionAndOrdering`) before files are
  * cut; `writePartitions` / `targetFileBytes` control file count and
  * size.
  *
  * Types cover the version-store column set (long/int/double/float/
  * boolean/string/date/timestamp — both LTZ and NTZ, stored as parquet
  * INT64 micros). Anything else fails loudly at read AND write time —
  * the graft fail-loud contract, not a silent null.
  */
class GraftVersionedProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftVersionedTable.resolveSchema(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftVersionedTable(schema,
      new CaseInsensitiveStringMap(properties))
}

private[sources] object GraftVersionedTable {

  def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-versioned needs a version root: .load(<root>)")
    p
  }

  def isChangeFeed(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("changeFeed", false)

  /** Resolve the snapshot version from versionAsOf / timestampAsOf /
    * latest — the same resolution rules as [[Versioned.read]] /
    * [[Versioned.readAsOf]] (stamp-based, never mtimes). */
  def resolveVersion(root: String, options: CaseInsensitiveStringMap): Long = {
    val vOpt = Option(options.get("versionAsOf")).map(_.toLong)
    val tOpt = Option(options.get("timestampAsOf")).map(_.toLong)
    require(vOpt.isEmpty || tOpt.isEmpty,
      "graft-versioned: give versionAsOf OR timestampAsOf, not both")
    vOpt.getOrElse {
      tOpt match {
        case Some(ts) => Versioned.resolveAsOf(root, ts)
        case None => Versioned.latestVersion(root).getOrElse(
          throw new IllegalStateException(s"no versions under $root"))
      }
    }
  }

  def snapshotDir(root: String, options: CaseInsensitiveStringMap): String =
    s"$root/v=${resolveVersion(root, options)}"

  /** Schema of the resolved snapshot (batch) or of the stored change
    * feed (changeFeed=true) — inferred once, driver-side, through the
    * engine's own parquet footer reader.
    *
    * An empty root is fail-loud (`no versions`) UNLESS the caller opts
    * into bootstrap with `.option("create", "true")` — the first write
    * to a fresh root has no schema to infer, so the table reports an
    * empty schema plus ACCEPT_ANY_SCHEMA and the write carries its own
    * (the catalog path never hits this: a created table's schema comes
    * from its manifest, not from inference). */
  def resolveSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val root = rootOf(options)
    if (isChangeFeed(options)) {
      val feeds = Versioned.feedVersions(root)
      require(feeds.nonEmpty,
        s"no change feed under $root — write versions with " +
          "Versioned.writeNextWithFeed to enable streaming reads")
      spark.read.parquet(Versioned.feedDir(root, feeds.head)).schema
    } else if (Versioned.latestVersion(root).isEmpty &&
               options.getBoolean("create", false)) {
      new StructType()
    } else {
      spark.read.parquet(snapshotDir(root, options)).schema
    }
  }
}

private[sources] class GraftVersionedTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  private val root = GraftVersionedTable.rootOf(options)
  private val changeFeed = GraftVersionedTable.isChangeFeed(options)

  override def name(): String =
    if (changeFeed) s"graft-versioned changes `$root`"
    else s"graft-versioned `$root`"

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    if (changeFeed)
      util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    else {
      val caps = util.EnumSet.of(
        TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
        TableCapability.STREAMING_WRITE)
      // bootstrap write to a fresh root: no schema to resolve against,
      // the write's own query schema becomes version 0's schema
      if (tableSchema.isEmpty) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
      caps
    }

  // SNAPSHOT PIN: an unpinned table resolves "latest" ONCE, here at
  // table construction — not per scan-planning call — so a DataFrame is
  // a stable snapshot (two actions on it, or two scan legs of one
  // self-join, can never read different versions when a concurrent
  // writer commits in between; the Delta-style contract). Explicit
  // versionAsOf/timestampAsOf options already pin deterministically.
  private val pinnedLatest: Option[Long] =
    if (changeFeed || options.containsKey("versionAsOf") ||
        options.containsKey("timestampAsOf")) None
    else Versioned.latestVersion(root)

  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // .load(root) options arrive here; table-construction options carry
    // the same map — prefer the read-time one
    val base = if (readOptions.isEmpty) options else readOptions
    val merged = pinnedLatest match {
      case Some(v) if !base.containsKey("versionAsOf") &&
          !base.containsKey("timestampAsOf") =>
        val m = new java.util.HashMap[String, String](base)
        m.put("versionAsOf", v.toString)
        new CaseInsensitiveStringMap(m)
      case _ => base
    }
    new GraftVersionedScanBuilder(tableSchema, merged)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!changeFeed,
      "the change feed is derived at commit time and read-only — " +
        "write snapshots to the root itself")
    require(!options.containsKey("versionAsOf") &&
        !options.containsKey("timestampAsOf"),
      "cannot write to a time-travel pinned snapshot — writes go to the " +
        "root (a new version)")
    // the table's own options carry the catalog-persisted layout
    // contract (clusterBy / writePartitions / targetFileBytes) — SQL
    // INSERTs have empty write options, so the builder consults both
    new GraftVersionedWriteBuilder(root, tableSchema, info, options)
  }

  // ---- SQL DELETE FROM (copy-on-write): the survivors become a new
  // version, so history is preserved and `VERSION AS OF` still shows
  // the pre-delete rows — the reference's delete-by-predicate (P10,
  // KeyedSink.deleteWhere null-keep semantics) as a SQL verb.

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    !changeFeed && filters.forall(GroupParquetIo.toColumn(_).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(!changeFeed, "the change feed is read-only")
    val spark = SparkSession.active
    if (Versioned.latestVersion(root).isEmpty) return // nothing to delete
    val cur = Versioned.read(spark, root)
    val pred = filters.flatMap(GroupParquetIo.toColumn).reduceOption(_ && _)
    val keep = pred match {
      // SQL DELETE removes rows where the predicate is TRUE; rows where
      // it evaluates NULL are KEPT (the P10 null-keep rule) — a plain
      // filter(!p) would silently drop them
      case Some(p) => cur.filter(
        org.apache.spark.sql.functions.not(
          org.apache.spark.sql.functions.coalesce(
            p, org.apache.spark.sql.functions.lit(false))))
      case None => cur.limit(0) // TRUNCATE TABLE: empty survivors
    }
    Versioned.writeNext(keep, root, Some(VersionedWriteIo.stampValue(None)))
  }
}

private[sources] class GraftVersionedScanBuilder(
    fullSchema: StructType, options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(f =>
      GroupParquetIo.translatable(f, fullSchema))
    pushed = ok
    residual // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // the reader needs the types of filter-referenced columns even when
    // they are pruned from the output projection
    val filterTypes: Map[String, DataType] =
      pushed.flatMap(_.references).distinct.flatMap(n =>
        fullSchema.fields.find(_.name == n).map(f => f.name -> f.dataType)).toMap
    new GraftVersionedScan(required, pushed, filterTypes, options)
  }
}

private[sources] class GraftVersionedScan(
    required: StructType, pushed: Array[Filter],
    filterTypes: Map[String, DataType], options: CaseInsensitiveStringMap)
  extends Scan with Batch {

  private val root = GraftVersionedTable.rootOf(options)

  override def readSchema(): StructType = required

  // a catalog table between CREATE and its first INSERT has a schema
  // (the manifest) but no versions — that is a legitimate empty table,
  // not an error; an explicit versionAsOf/timestampAsOf on such a root
  // still fails loudly through resolveVersion
  private def uninitialized: Boolean =
    Versioned.latestVersion(root).isEmpty &&
      !options.containsKey("versionAsOf") &&
      !options.containsKey("timestampAsOf")

  override def description(): String = {
    val what =
      if (GraftVersionedTable.isChangeFeed(options)) "changeFeed"
      else if (uninitialized) "version=<empty table>"
      else s"version=${GraftVersionedTable.resolveVersion(root, options)}"
    s"GraftVersionedScan $what, " +
      s"ReadColumns: [${required.fieldNames.mkString(", ")}], " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  }

  override def toBatch: Batch = {
    require(!GraftVersionedTable.isChangeFeed(options),
      "the change feed is a streaming source — use readStream")
    this
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (uninitialized) return Array.empty
    val dir = GraftVersionedTable.snapshotDir(root, options)
    // catalog tables resolve schema from the manifest, so a bad
    // versionAsOf would otherwise sail through to an empty file listing
    // and silently read as zero rows — fail loudly instead
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)),
      s"graft-versioned: version dir $dir does not exist " +
        s"(existing: ${Versioned.versions(root).mkString("v=", ", v=", "")})")
    GroupParquetIo.splitByRowGroup(
      Versioned.dataFiles(java.nio.file.Paths.get(dir)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GroupParquetReaderFactory(required, pushed, filterTypes)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(GraftVersionedTable.isChangeFeed(options),
      "streaming reads need .option(\"changeFeed\", \"true\") — snapshots are batch")
    new GraftChangeFeedStream(root, required, pushed, filterTypes,
      options.getLong("startingVersion", 0L))
  }
}

/** The stored change feed as a micro-batch stream: offsets are commit
  * versions; a batch covering (start, end] reads the feed files of those
  * versions. The feed is immutable, so replay from any checkpointed
  * offset re-reads the identical rows (deterministic recovery). */
private[sources] class GraftChangeFeedStream(
    root: String, required: StructType, pushed: Array[Filter],
    filterTypes: Map[String, DataType], startingVersion: Long)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def currentLatest: Long =
    Versioned.feedVersions(root).lastOption.getOrElse(startingVersion - 1)

  // Trigger.AvailableNow pins the drain target at query start
  private var availableTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(currentLatest)

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion - 1)

  override def latestOffset(): Offset =
    GraftVersionOffset(availableTarget.getOrElse(currentLatest))

  // SupportsAdmissionControl variant (Trigger.AvailableNow drains
  // through this one); the version store has no rate limit to honor —
  // a commit is the admission unit
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    Versioned.feedVersions(root).filter(v => v > s && v <= e)
      .flatMap { v =>
        GroupParquetIo.splitByRowGroup(
          Versioned.dataFiles(java.nio.file.Paths.get(Versioned.feedDir(root, v))))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GroupParquetReaderFactory(required, pushed, filterTypes)

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

private[sources] case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** One parquet ROW GROUP = one input partition: `[rangeStart,
  * rangeEnd)` is the byte range whose midpoint selects exactly this
  * row group inside the file (parquet-mr's own split rule), so a 1 GB
  * file with 8 row groups fans out to 8 tasks — file count no longer
  * caps parallelism at scale. A negative range means "whole file"
  * (streaming-feed fallbacks and older call sites). */
private[sources] case class GroupParquetPartition(
    file: String, rangeStart: Long = -1L, rangeEnd: Long = -1L)
  extends InputPartition

private[sources] case class GroupParquetReaderFactory(
    required: StructType, pushed: Array[Filter],
    filterTypes: Map[String, DataType])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GroupParquetPartition]
    new GroupParquetPartitionReader(p.file, p.rangeStart, p.rangeEnd,
      required, pushed, filterTypes)
  }
}

/** Executor-side reader: parquet example-Group assembly under a
  * projection of (required ∪ filter) columns, with pushed predicates
  * compiled to parquet `FilterPredicate`s (row-group stats + dictionary
  * + record-level filtering happen inside parquet-mr; rows that fail
  * never reach Spark). */
private[sources] class GroupParquetPartitionReader(
    file: String, rangeStart: Long, rangeEnd: Long,
    required: StructType, pushed: Array[Filter],
    filterTypes: Map[String, DataType])
  extends PartitionReader[InternalRow] {

  private val conf = new Configuration()

  private val fileSchema: MessageType = {
    val in = ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(file), conf))
    try in.getFooter.getFileMetaData.getSchema finally in.close()
  }

  // projection = required ∪ filter columns (record-level filtering
  // evaluates on the assembled record, so filter columns must be read
  // even when pruned from the output); a fully-pruned scan (count(*))
  // still needs one column to drive record iteration
  private val projNames: Seq[String] = {
    val want = (required.fieldNames ++ filterTypes.keys).distinct.toSeq
    if (want.nonEmpty) want else Seq(fileSchema.getFields.get(0).getName)
  }

  private val reader: ParquetReader[org.apache.parquet.example.data.Group] = {
    val projected = new MessageType(fileSchema.getName,
      projNames.map { n =>
        require(fileSchema.containsField(n),
          s"graft-versioned: column '$n' not in parquet file $file")
        fileSchema.getType(fileSchema.getFieldIndex(n))
      }.asJava)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projected.toString)
    val b0 = ParquetReader.builder(new GroupReadSupport(), new HPath(file))
      .withConf(conf)
    // row-group split: the range's midpoint rule selects exactly this
    // partition's group (negative range = whole file)
    val b = if (rangeStart >= 0) b0.withFileRange(rangeStart, rangeEnd) else b0
    GroupParquetIo.compile(pushed, filterTypes) match {
      case Some(pred) => b.withFilter(FilterCompat.get(pred)).build()
      case None => b.build()
    }
  }

  private var current: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val gType = g.getType
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      val gi = gType.getFieldIndex(f.name)
      if (g.getFieldRepetitionCount(gi) == 0) row.update(i, null)
      else f.dataType match {
        case LongType    => row.setLong(i, g.getLong(gi, 0))
        case IntegerType => row.setInt(i, g.getInteger(gi, 0))
        case DoubleType  => row.setDouble(i, g.getDouble(gi, 0))
        case FloatType   => row.setFloat(i, g.getFloat(gi, 0))
        case BooleanType => row.setBoolean(i, g.getBoolean(gi, 0))
        case DateType    => row.setInt(i, g.getInteger(gi, 0))
        case StringType  =>
          row.update(i, UTF8String.fromBytes(g.getBinary(gi, 0).getBytes))
        case TimestampType | TimestampNTZType =>
          row.setLong(i, g.getLong(gi, 0)) // micros, the parquet encoding
        case other => throw new UnsupportedOperationException(
          s"graft-versioned: unsupported column type ${other.simpleString} " +
            s"for '${f.name}' — the reader covers the version-store " +
            "column set (long/int/double/float/boolean/string/date/timestamp)")
      }
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}

/** Spark [[Filter]] → parquet [[FilterPredicate]] translation for the
  * supported atomic types. `translatable` (pushdown time) and `compile`
  * (read time) agree by construction: anything accepted at pushdown has
  * a typed compilation, so Spark only re-applies true residuals. */
private[sources] object GroupParquetIo {

  /** Plan one input partition PER ROW GROUP: a driver-side footer read
    * per file lists the groups; each partition carries the byte range
    * `[startingPos, startingPos + compressedSize)` whose midpoint is
    * inside exactly that group (parquet-mr's own range→group rule, so
    * the executor-side `withFileRange` selects it and nothing else).
    * Files are the durability unit, row groups the parallelism unit —
    * a compacted 1 GB file still fans out to its ~8 groups instead of
    * capping the stage at file count. Single-group files cost one
    * footer read and plan exactly as before. */
  def splitByRowGroup(files: Seq[java.nio.file.Path]): Array[InputPartition] =
    files.sortBy(_.getFileName.toString).flatMap { p =>
      val in = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(p.toString), new Configuration()))
      val blocks =
        try in.getFooter.getBlocks.asScala.toSeq finally in.close()
      if (blocks.size <= 1) Seq(GroupParquetPartition(p.toString))
      else blocks.map { b =>
        GroupParquetPartition(p.toString, b.getStartingPos,
          b.getStartingPos + b.getCompressedSize)
      }
    }.toArray

  /** Spark [[Filter]] → Column predicate for the DELETE rewrite — a
    * BROADER vocabulary than the parquet pushdown set (Or/Not/In/
    * null-safe equality compose fine as Catalyst expressions even
    * though parquet-mr cannot evaluate them at the page level).
    * Returns None for anything unsupported, which makes
    * `canDeleteWhere` reject the whole DELETE loudly at analysis. */
  def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case StringContains(a, v) => Some(col(a).contains(v))
      case And(l, r) => for { x <- toColumn(l); y <- toColumn(r) } yield x && y
      case Or(l, r) => for { x <- toColumn(l); y <- toColumn(r) } yield x || y
      case Not(c) => toColumn(c).map(!_)
      case AlwaysTrue() => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  def translatable(f: Filter, schema: StructType): Boolean = {
    def typeOf(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType)
    def atomic(name: String): Boolean = typeOf(name).exists {
      case LongType | IntegerType | DoubleType | FloatType |
           BooleanType | StringType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    def ordered(name: String): Boolean = typeOf(name).exists {
      case LongType | IntegerType | DoubleType | FloatType | StringType |
           DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    f match {
      case EqualTo(a, v) => v != null && atomic(a)
      case GreaterThan(a, _) => ordered(a)
      case GreaterThanOrEqual(a, _) => ordered(a)
      case LessThan(a, _) => ordered(a)
      case LessThanOrEqual(a, _) => ordered(a)
      case IsNull(a) => atomic(a)
      case IsNotNull(a) => atomic(a)
      case And(l, r) => translatable(l, schema) && translatable(r, schema)
      case _ => false
    }
  }

  def compile(filters: Array[Filter],
              types: Map[String, DataType]): Option[FilterPredicate] =
    filters.flatMap(one(_, types)).reduceOption(FilterApi.and)

  // date literals arrive as LocalDate or java.sql.Date (datetime
  // java8API setting) — parquet wants epoch days
  private def toDays(v: Any): java.lang.Integer = v match {
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"graft-versioned: cannot convert ${other.getClass.getName} to epoch days")
  }

  // timestamp literals arrive as Instant / java.sql.Timestamp (LTZ) or
  // LocalDateTime (NTZ) — parquet wants epoch micros
  private def toMicros(v: Any): java.lang.Long = v match {
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    case ts: java.sql.Timestamp =>
      // floorDiv, not /: plain division truncates toward zero, so a
      // pre-1970 timestamp (negative millis) would round the wrong way
      // and the pushed predicate would silently drop matching rows
      Math.addExact(Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L),
        ts.getNanos / 1000L)
    case ldt: java.time.LocalDateTime =>
      val i = ldt.toInstant(java.time.ZoneOffset.UTC)
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"graft-versioned: cannot convert ${other.getClass.getName} to epoch micros")
  }

  // the typed-column handle comes from the COLUMN's Catalyst type (the
  // literal may arrive as a narrower boxed type than the column)
  private def one(f: Filter, t: Map[String, DataType]): Option[FilterPredicate] = {
    def cmp(a: String, v: Any,
            onLong: java.lang.Long => FilterPredicate,
            onInt: java.lang.Integer => FilterPredicate,
            onDouble: java.lang.Double => FilterPredicate,
            onFloat: java.lang.Float => FilterPredicate,
            onStr: Binary => FilterPredicate): Option[FilterPredicate] =
      t.get(a).flatMap {
        case LongType => Some(onLong(v.asInstanceOf[Number].longValue()))
        case IntegerType => Some(onInt(v.asInstanceOf[Number].intValue()))
        case DateType => Some(onInt(toDays(v)))
        case TimestampType | TimestampNTZType => Some(onLong(toMicros(v)))
        case DoubleType => Some(onDouble(v.asInstanceOf[Number].doubleValue()))
        case FloatType => Some(onFloat(v.asInstanceOf[Number].floatValue()))
        case StringType => Some(onStr(Binary.fromString(v.toString)))
        case _ => None
      }
    f match {
      case EqualTo(a, v: java.lang.Boolean) if t.get(a).contains(BooleanType) =>
        Some(FilterApi.eq(FilterApi.booleanColumn(a), v))
      case EqualTo(a, v) => cmp(a, v,
        FilterApi.eq(FilterApi.longColumn(a), _),
        FilterApi.eq(FilterApi.intColumn(a), _),
        FilterApi.eq(FilterApi.doubleColumn(a), _),
        FilterApi.eq(FilterApi.floatColumn(a), _),
        FilterApi.eq(FilterApi.binaryColumn(a), _))
      case GreaterThan(a, v) => cmp(a, v,
        FilterApi.gt(FilterApi.longColumn(a), _),
        FilterApi.gt(FilterApi.intColumn(a), _),
        FilterApi.gt(FilterApi.doubleColumn(a), _),
        FilterApi.gt(FilterApi.floatColumn(a), _),
        FilterApi.gt(FilterApi.binaryColumn(a), _))
      case GreaterThanOrEqual(a, v) => cmp(a, v,
        FilterApi.gtEq(FilterApi.longColumn(a), _),
        FilterApi.gtEq(FilterApi.intColumn(a), _),
        FilterApi.gtEq(FilterApi.doubleColumn(a), _),
        FilterApi.gtEq(FilterApi.floatColumn(a), _),
        FilterApi.gtEq(FilterApi.binaryColumn(a), _))
      case LessThan(a, v) => cmp(a, v,
        FilterApi.lt(FilterApi.longColumn(a), _),
        FilterApi.lt(FilterApi.intColumn(a), _),
        FilterApi.lt(FilterApi.doubleColumn(a), _),
        FilterApi.lt(FilterApi.floatColumn(a), _),
        FilterApi.lt(FilterApi.binaryColumn(a), _))
      case LessThanOrEqual(a, v) => cmp(a, v,
        FilterApi.ltEq(FilterApi.longColumn(a), _),
        FilterApi.ltEq(FilterApi.intColumn(a), _),
        FilterApi.ltEq(FilterApi.doubleColumn(a), _),
        FilterApi.ltEq(FilterApi.floatColumn(a), _),
        FilterApi.ltEq(FilterApi.binaryColumn(a), _))
      case IsNull(a) => isNullPred(a, t)
      case IsNotNull(a) => isNullPred(a, t).map(FilterApi.not)
      case And(l, r) => for { x <- one(l, t); y <- one(r, t) }
        yield FilterApi.and(x, y)
      case _ => None
    }
  }

  // eq(typedColumn, null) is parquet's null test — the handle must
  // match the column's physical type or the schema validator throws
  private def isNullPred(a: String,
                         t: Map[String, DataType]): Option[FilterPredicate] =
    t.get(a).collect {
      case LongType | TimestampType | TimestampNTZType =>
        FilterApi.eq(FilterApi.longColumn(a), null.asInstanceOf[java.lang.Long])
      case IntegerType | DateType =>
        FilterApi.eq(FilterApi.intColumn(a), null.asInstanceOf[java.lang.Integer])
      case DoubleType => FilterApi.eq(FilterApi.doubleColumn(a), null.asInstanceOf[java.lang.Double])
      case FloatType => FilterApi.eq(FilterApi.floatColumn(a), null.asInstanceOf[java.lang.Float])
      case BooleanType => FilterApi.eq(FilterApi.booleanColumn(a), null.asInstanceOf[java.lang.Boolean])
      case StringType => FilterApi.eq(FilterApi.binaryColumn(a), null.asInstanceOf[Binary])
    }

  /** Catalyst schema → parquet MessageType for the WRITE side — the
    * exact mirror of the reader's type set, so anything this writer
    * commits the reader (and Spark's own vectorized parquet scan) reads
    * back losslessly. Fails loudly on any type outside the set — at
    * write-BUILD time (driver), before a single task launches. */
  def writeMessageType(schema: StructType): MessageType = {
    require(schema.nonEmpty, "graft-versioned: cannot write a zero-column schema")
    val b = PTypes.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.INT64, Repetition.OPTIONAL).named(f.name))
        case IntegerType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.INT32, Repetition.OPTIONAL).named(f.name))
        case DoubleType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.DOUBLE, Repetition.OPTIONAL).named(f.name))
        case FloatType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.FLOAT, Repetition.OPTIONAL).named(f.name))
        case BooleanType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.BOOLEAN, Repetition.OPTIONAL).named(f.name))
        case StringType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.BINARY, Repetition.OPTIONAL)
            .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case DateType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.INT32, Repetition.OPTIONAL)
            .as(LogicalTypeAnnotation.dateType()).named(f.name))
        case TimestampType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.INT64, Repetition.OPTIONAL)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name))
        case TimestampNTZType =>
          b.addField(PTypes.primitive(PrimitiveTypeName.INT64, Repetition.OPTIONAL)
            .as(LogicalTypeAnnotation.timestampType(false,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name))
        case other => throw new UnsupportedOperationException(
          s"graft-versioned: unsupported column type ${other.simpleString} " +
            s"for '${f.name}' — the store's column set is " +
            "long/int/double/float/boolean/string/date/timestamp")
      }
    }
    b.named("graft_versioned")
  }
}

// ============================================================ write path

/** WriteBuilder for the version store. Default mode APPENDS: the new
  * version is previous ∪ written rows (previous data files are
  * hard-linked into the commit — immutable files make the link safe and
  * O(files), never a data copy). `truncate()` (DataFrameWriter
  * mode("overwrite"), SQL INSERT OVERWRITE, streaming OutputMode
  * Complete) switches to snapshot-REPLACE: the new version is exactly
  * the written rows — the reference's copy-then-replace discipline
  * (price_prediction_data_pipeline.py:140-177) as a SQL verb. Either
  * way history is preserved; rollback/retention/time travel see one
  * more version. */
private[sources] class GraftVersionedWriteBuilder(
    root: String, tableSchema: StructType, info: LogicalWriteInfo,
    tableOptions: CaseInsensitiveStringMap)
  extends WriteBuilder with SupportsTruncate {

  private var replace = false

  // write-time options win over the table's persisted layout contract
  private def opt(key: String): Option[String] =
    Option(info.options.get(key)).orElse(Option(tableOptions.get(key)))

  override def truncate(): WriteBuilder = { replace = true; this }

  override def build(): Write = {
    val schema = info.schema()
    GroupParquetIo.writeMessageType(schema) // fail loud on unsupported types now
    // appending to existing versions: the combined snapshot must be
    // homogeneous — require positional name+type equality with the
    // current version (replace may change schema: each version dir
    // carries its own footer schema and pinned readers use their own)
    Versioned.latestVersion(root).foreach { v =>
      if (!replace) {
        val existing = SparkSession.active.read.parquet(s"$root/v=$v").schema
        val got = schema.fields.map(f => (f.name, f.dataType)).toSeq
        val want = existing.fields.map(f => (f.name, f.dataType)).toSeq
        require(got == want,
          s"graft-versioned append schema mismatch under $root: " +
            s"writing ${schema.simpleString} onto v=$v ${existing.simpleString} — " +
            "append requires identical columns; use overwrite to change schema")
      }
    }
    val stamp = opt("commitTs").map(_.toLong)
    // writer-side layout: range-cluster + sort on these columns before
    // the files are cut, so every committed file covers a narrow
    // min/max slice of the cluster key (footer-stats pruning for every
    // future reader). From `.option("clusterBy", ...)` on path writes
    // or the table's `clusterBy` TBLPROPERTY through the catalog.
    val clusterBy = opt("clusterBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    clusterBy.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"graft-versioned: clusterBy column '$c' not in write schema " +
          s"${schema.fieldNames.mkString("[", ", ", "]")}")
    }
    // file-count / file-size control: writePartitions fixes the number
    // of output partitions (= files); targetFileBytes feeds AQE's
    // advisory partition sizing so file sizes track the target
    val writeParts = opt("writePartitions").map(_.toInt)
    writeParts.foreach(n => require(n > 0,
      s"graft-versioned: writePartitions must be positive, got $n"))
    val targetBytes = opt("targetFileBytes").map(_.toLong)
    new GraftVersionedWrite(root, schema, replace, stamp, info.queryId(),
      clusterBy, writeParts, targetBytes)
  }
}

private[sources] class GraftVersionedWrite(
    root: String, schema: StructType, replace: Boolean,
    commitTs: Option[Long], queryId: String, clusterBy: Seq[String],
    writeParts: Option[Int] = None, targetBytes: Option[Long] = None)
  extends Write with RequiresDistributionAndOrdering {

  override def description(): String =
    s"GraftVersionedWrite ${if (replace) "replace" else "append"} `$root`" +
      (if (clusterBy.nonEmpty) s" clusterBy=${clusterBy.mkString(",")}" else "")

  // Spark plans the range exchange + sort for us (the DataFrame-side
  // Layout.applySpec contract expressed through the V2 write protocol);
  // unspecified + empty ordering is the documented no-op
  private def orders: Array[SortOrder] =
    clusterBy.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray

  override def requiredDistribution(): Distribution =
    if (clusterBy.isEmpty) Distributions.unspecified()
    else Distributions.ordered(orders)

  override def requiredOrdering(): Array[SortOrder] = orders

  // 0 = "no requirement" / "session default" in the V2 write contract
  override def requiredNumPartitions(): Int = writeParts.getOrElse(0)
  override def advisoryPartitionSizeInBytes(): Long = targetBytes.getOrElse(0L)

  override def toBatch: BatchWrite =
    new GraftBatchWrite(root, schema, replace, commitTs, queryId)

  override def toStreaming: StreamingWrite =
    new GraftStreamingWrite(root, schema, replace, commitTs, queryId)
}

/** Batch write: tasks stage parquet files under `root/_staging_<id>`
  * (underscore-prefixed — invisible to every reader), the driver commit
  * links in the previous version's files (append mode), then publishes
  * the whole directory as `v=<next>` with ONE atomic rename. A reader
  * can never observe a half-written version; abort deletes the staging
  * dir and the store is untouched. */
private[sources] class GraftBatchWrite(
    root: String, schema: StructType, replace: Boolean,
    commitTs: Option[Long], queryId: String) extends BatchWrite {

  private val staged = java.nio.file.Paths.get(
    root, s"_staging_${queryId}_${java.util.UUID.randomUUID.toString.take(8)}")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(staged)
    GroupParquetWriterFactory(schema, staged.toString)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    VersionedWriteIo.keepOnly(staged, messages)
    VersionedWriteIo.commitStaged(root, staged, schema,
      appendPrev = !replace, stamp = VersionedWriteIo.stampValue(commitTs),
      epochTag = None)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    Versioned.deleteRecursively(staged)
}

/** Streaming write: every micro-batch epoch commits one version —
  * append mode grows the snapshot (OutputMode.Append/Update), truncate
  * replaces it (OutputMode.Complete). Epoch replay after a restart is
  * IDEMPOTENT: the committed version carries a `_graft_epoch` tag
  * (queryId:epochId) written into the staging dir BEFORE the atomic
  * rename, so the replay check and the commit are one filesystem
  * event — a replayed epoch finds its tag and drops its staged files
  * instead of double-appending. */
private[sources] class GraftStreamingWrite(
    root: String, schema: StructType, replace: Boolean,
    commitTs: Option[Long], queryId: String) extends StreamingWrite {

  private val stagedBase = java.nio.file.Paths.get(root, s"_staging_stream_$queryId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    java.nio.file.Files.createDirectories(stagedBase)
    GroupParquetWriterFactory(schema, stagedBase.toString)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val epochDir = stagedBase.resolve(s"epoch=$epochId")
    val tag = s"$queryId:$epochId"
    if (VersionedWriteIo.epochCommitted(root, tag)) {
      Versioned.deleteRecursively(epochDir) // replayed epoch — already in
      return
    }
    java.nio.file.Files.createDirectories(epochDir)
    VersionedWriteIo.keepOnly(epochDir, messages)
    // a deterministic stamp ladder when the caller provided commitTs
    // (epoch i lands at commitTs+i); wall-clock micros otherwise
    val stamp = commitTs.map(_ + epochId)
      .getOrElse(VersionedWriteIo.stampValue(None))
    VersionedWriteIo.commitStaged(root, epochDir, schema,
      appendPrev = !replace, stamp = stamp, epochTag = Some(tag))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    Versioned.deleteRecursively(stagedBase.resolve(s"epoch=$epochId"))
}

private[sources] case class StagedFilesMessage(files: Seq[String])
  extends WriterCommitMessage

/** Commit machinery shared by batch and streaming writes. */
private[sources] object VersionedWriteIo {

  import java.nio.file.{Files, Path, Paths, StandardCopyOption}

  def stampValue(commitTs: Option[Long]): Long =
    // every DSv2 commit is stamped (time travel always works on a
    // DSv2-written root); default stamp is wall-clock MICROS so SQL
    // `TIMESTAMP AS OF` (which resolves to micros) lands in stamp space
    commitTs.getOrElse(System.currentTimeMillis() * 1000L)

  /** Drop staged files not named in any commit message — the leftovers
    * of speculative or failed task attempts whose abort never ran. */
  def keepOnly(staged: Path, messages: Array[WriterCommitMessage]): Unit = {
    val keep = messages.collect {
      case StagedFilesMessage(fs) => fs
    }.flatten.toSet
    Versioned.dataFiles(staged)
      .filterNot(f => keep(f.getFileName.toString))
      .foreach(Files.delete(_))
  }

  private def epochTagOf(root: String, version: Long): Option[String] = {
    val f = Paths.get(root, s"v=$version", "_graft_epoch")
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8).trim)
    else None
  }

  def epochCommitted(root: String, tag: String): Boolean =
    Versioned.versions(root).exists(v => epochTagOf(root, v).contains(tag))

  /** Delete `_staging_*` leftovers older than `olderThanMs` — what a
    * crashed driver's un-aborted write leaves behind (a successful
    * commit renames its staging dir away; abort deletes it). Age-gated
    * so an in-flight writer's staging is never swept: a live commit
    * holds its staging dir for seconds, the default window is a day.
    * Returns the deleted directory names. */
  def vacuumStaging(root: String, olderThanMs: Long): Seq[String] = {
    val p = Paths.get(root)
    if (!Files.isDirectory(p)) return Seq.empty
    val cutoff = System.currentTimeMillis() - olderThanMs
    val stream = Files.list(p)
    val stale =
      try stream.iterator().asScala.filter { d =>
        d.getFileName.toString.startsWith("_staging") &&
          Files.getLastModifiedTime(d).toMillis < cutoff
      }.toList
      finally stream.close()
    stale.foreach(Versioned.deleteRecursively)
    stale.map(_.getFileName.toString).sorted
  }

  /** Publish a staged directory as the next version. Optimistic
    * concurrency: compute `next`, link the previous version's files in
    * (append mode), atomically rename; if another writer claimed
    * `v=next` first, the rename fails, the stale links are replaced
    * against the NEW latest, and the commit retries — serialized
    * multi-writer appends without a lock service, bounded and loud. */
  def commitStaged(root: String, staged: Path, schema: StructType,
                   appendPrev: Boolean, stamp: Long,
                   epochTag: Option[String]): Long = {
    // an all-empty-partitions write still commits a readable version:
    // one zero-row file carries the schema for every future reader
    if (Versioned.dataFiles(staged).isEmpty)
      GroupParquetWriterFactory(schema, staged.toString)
        .emptyFile("part-00000-empty.parquet")
    epochTag.foreach { t =>
      Files.write(staged.resolve("_graft_epoch"),
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    var attempt = 0
    var prevLinked: Seq[Path] = Nil
    while (attempt < 20) {
      val prev = Versioned.latestVersion(root)
      val next = prev.map(_ + 1).getOrElse(0L)
      if (appendPrev) {
        prevLinked.foreach(Files.deleteIfExists(_))
        prevLinked = prev.toSeq.flatMap { p =>
          Versioned.dataFiles(Paths.get(root, s"v=$p")).map { f =>
            val tgt = staged.resolve(s"prev-v$p-${f.getFileName}")
            try Files.createLink(tgt, f)
            catch { case _: UnsupportedOperationException => Files.copy(f, tgt) }
            tgt
          }
        }
      }
      try {
        Files.move(staged, Paths.get(root, s"v=$next"), StandardCopyOption.ATOMIC_MOVE)
        Versioned.writeStamp(root, next, stamp)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.FileSystemException =>
          attempt += 1 // v=next was claimed concurrently — recompute
      }
    }
    throw new IllegalStateException(
      s"graft-versioned: could not commit under $root after 20 attempts — " +
        "either extreme write contention or the root is not writable")
  }
}

/** Executor-side writer: one parquet file per non-empty partition,
  * created lazily on the first row (no empty-file litter from empty
  * shuffle partitions), named by (partition, task attempt) so
  * speculative attempts never collide. */
private[sources] case class GroupParquetWriterFactory(
    schema: StructType, stagingDir: String)
  extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GroupParquetDataWriter(stagingDir,
      f"part-$partitionId%05d-$taskId.parquet", schema)

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GroupParquetDataWriter(s"$stagingDir/epoch=$epochId",
      f"part-$partitionId%05d-$taskId.parquet", schema)

  /** Zero-row file with the write schema (driver-side, commit path). */
  def emptyFile(name: String): Unit =
    new GroupParquetDataWriter(stagingDir, name, schema).forceCreateAndClose()
}

private[sources] class GroupParquetDataWriter(
    dir: String, fileName: String, schema: StructType)
  extends DataWriter[InternalRow] {

  private lazy val msgType: MessageType = GroupParquetIo.writeMessageType(schema)
  private var writer: ParquetWriter[Group] = null
  private var path: java.nio.file.Path = null

  private def open(): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    path = java.nio.file.Paths.get(dir, fileName)
    writer = ExampleParquetWriter.builder(new HPath(path.toString))
      .withType(msgType).withConf(new Configuration()).build()
  }

  private[sources] def forceCreateAndClose(): Unit = { open(); writer.close() }

  override def write(row: InternalRow): Unit = {
    if (writer == null) open()
    val g = new SimpleGroup(msgType)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case LongType    => g.add(i, row.getLong(i))
        case IntegerType => g.add(i, row.getInt(i))
        case DateType    => g.add(i, row.getInt(i))
        case TimestampType | TimestampNTZType => g.add(i, row.getLong(i))
        case DoubleType  => g.add(i, row.getDouble(i))
        case FloatType   => g.add(i, row.getFloat(i))
        case BooleanType => g.add(i, row.getBoolean(i))
        case StringType  =>
          g.add(i, Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
        case other => throw new UnsupportedOperationException(
          s"graft-versioned: unsupported column type ${other.simpleString}")
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    StagedFilesMessage(if (path == null) Seq.empty else Seq(fileName))
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    if (path != null) java.nio.file.Files.deleteIfExists(path)
  }

  override def close(): Unit = ()
}
