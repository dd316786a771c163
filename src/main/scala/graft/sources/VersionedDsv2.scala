package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  * materialized). One input partition per data file; at 100 TB the
  * per-file unit is what a splitting planner would subdivide by row
  * group, and the version dirs themselves are the parallelism (a
  * compacted version holds size-targeted files, Versioned.compact).
  *
  * Types cover the version-store column set (long/int/double/float/
  * boolean/string/date). Anything else fails loudly at read time — the
  * graft fail-loud contract, not a silent null.
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
    * engine's own parquet footer reader. */
  def resolveSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val root = rootOf(options)
    if (isChangeFeed(options)) {
      val feeds = Versioned.feedVersions(root)
      require(feeds.nonEmpty,
        s"no change feed under $root — write versions with " +
          "Versioned.writeNextWithFeed to enable streaming reads")
      spark.read.parquet(Versioned.feedDir(root, feeds.head)).schema
    } else {
      spark.read.parquet(snapshotDir(root, options)).schema
    }
  }
}

private[sources] class GraftVersionedTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  private val root = GraftVersionedTable.rootOf(options)
  private val changeFeed = GraftVersionedTable.isChangeFeed(options)

  override def name(): String =
    if (changeFeed) s"graft-versioned changes `$root`"
    else s"graft-versioned `$root`"

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    if (changeFeed)
      util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    else
      util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // .load(root) options arrive here; table-construction options carry
    // the same map — prefer the read-time one
    val merged = if (readOptions.isEmpty) options else readOptions
    new GraftVersionedScanBuilder(tableSchema, merged)
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

  override def description(): String = {
    val what =
      if (GraftVersionedTable.isChangeFeed(options)) "changeFeed"
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
    val dir = GraftVersionedTable.snapshotDir(root, options)
    Versioned.dataFiles(java.nio.file.Paths.get(dir))
      .sortBy(_.getFileName.toString)
      .map(p => GroupParquetPartition(p.toString): InputPartition)
      .toArray
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
        Versioned.dataFiles(java.nio.file.Paths.get(Versioned.feedDir(root, v)))
          .sortBy(_.getFileName.toString)
          .map(p => GroupParquetPartition(p.toString): InputPartition)
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

/** One parquet data file = one input partition (the row-group split is
  * the obvious refinement at scale; version files are size-targeted by
  * Versioned.compact so the per-file unit stays balanced). */
private[sources] case class GroupParquetPartition(file: String) extends InputPartition

private[sources] case class GroupParquetReaderFactory(
    required: StructType, pushed: Array[Filter],
    filterTypes: Map[String, DataType])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GroupParquetPartitionReader(
      partition.asInstanceOf[GroupParquetPartition].file,
      required, pushed, filterTypes)
}

/** Executor-side reader: parquet example-Group assembly under a
  * projection of (required ∪ filter) columns, with pushed predicates
  * compiled to parquet `FilterPredicate`s (row-group stats + dictionary
  * + record-level filtering happen inside parquet-mr; rows that fail
  * never reach Spark). */
private[sources] class GroupParquetPartitionReader(
    file: String, required: StructType, pushed: Array[Filter],
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
    val b = ParquetReader.builder(new GroupReadSupport(), new HPath(file))
      .withConf(conf)
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
        case other => throw new UnsupportedOperationException(
          s"graft-versioned: unsupported column type ${other.simpleString} " +
            s"for '${f.name}' — the reader covers the version-store " +
            "column set (long/int/double/float/boolean/string/date)")
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

  def translatable(f: Filter, schema: StructType): Boolean = {
    def typeOf(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType)
    def atomic(name: String): Boolean = typeOf(name).exists {
      case LongType | IntegerType | DoubleType | FloatType |
           BooleanType | StringType => true
      case _ => false
    }
    def ordered(name: String): Boolean = typeOf(name).exists {
      case LongType | IntegerType | DoubleType | FloatType | StringType => true
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
      case LongType => FilterApi.eq(FilterApi.longColumn(a), null.asInstanceOf[java.lang.Long])
      case IntegerType => FilterApi.eq(FilterApi.intColumn(a), null.asInstanceOf[java.lang.Integer])
      case DoubleType => FilterApi.eq(FilterApi.doubleColumn(a), null.asInstanceOf[java.lang.Double])
      case FloatType => FilterApi.eq(FilterApi.floatColumn(a), null.asInstanceOf[java.lang.Float])
      case BooleanType => FilterApi.eq(FilterApi.booleanColumn(a), null.asInstanceOf[java.lang.Boolean])
      case StringType => FilterApi.eq(FilterApi.binaryColumn(a), null.asInstanceOf[Binary])
    }
}
