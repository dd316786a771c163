package graft.sources

import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The `PARTITIONED BY` transform model shared by the catalog (DDL),
  * the write path (clustered layout), and the scan (storage-partitioned
  * joins + pruning).
  *
  * Two transform families are accepted:
  *
  *  - IDENTITY (`PARTITIONED BY (g)`): maps onto the clusterBy +
  *    file-stats-skipping layout — every insert range-clusters on the
  *    column, each file pins one (or a narrow slice of) value(s).
  *  - BUCKET (`PARTITIONED BY (bucket(16, k))`): Iceberg's hash
  *    transform, realized the Delta way — a real, visible GENERATED
  *    column `<col>_bucket = pmod(hash(col), n)` materializes the
  *    bucket id (Delta's documented recipe: generated partition
  *    columns), the layout clusters on it, and the scan reports
  *    `bucket(n, col)` KeyGroupedPartitioning so two co-bucketed
  *    tables joining on the RAW key skip both shuffle exchanges (the
  *    Iceberg SPJ shape — the 100 TB fact⋈fact join on a
  *    high-cardinality key becomes a zipped per-bucket merge that no
  *    identity partitioning could express).
  *
  * Temporal transforms (days/months/years/hours) map the same way —
  * a generated truncation column plus the clustered layout (see
  * [[temporalExprSql]]); `truncate(n, col)` stays loudly unsupported.
  *
  * The stored `partitionedBy` property records the DDL spelling
  * (`"g,bucket(16,k)"`); [[parse]]/[[spellingOf]] round-trip it. The
  * bucket hash is Spark's own `hash()` (Murmur3, seed 42) taken
  * `pmod` the bucket count, so the generated column's SQL expression
  * and the V2 function the catalog exports for Spark's SPJ machinery
  * agree bit-for-bit ([[GraftBucketFunction]] — property-tested).
  */
object PartitionTransforms {

  sealed trait Entry {
    /** DDL spelling stored in the `partitionedBy` property. */
    def spelling: String
    /** The schema column the layout actually clusters on. */
    def clusterCol: String
    /** The user column the transform references. */
    def sourceCol: String
  }

  final case class IdentityPart(col: String) extends Entry {
    def spelling: String = col
    def clusterCol: String = col
    def sourceCol: String = col
  }

  final case class BucketPart(numBuckets: Int, col: String) extends Entry {
    def spelling: String = s"bucket($numBuckets,$col)"
    def clusterCol: String = s"${col}_bucket"
    def sourceCol: String = col
  }

  final case class TemporalPart(unit: String, col: String) extends Entry {
    def spelling: String = s"$unit($col)"
    def clusterCol: String = s"${col}_$unit"
    def sourceCol: String = col
  }

  private[sources] val TemporalUnits = Set("years", "months", "days", "hours")

  /** Comma split that respects parentheses: `"g,bucket(16,k)"` →
    * `Seq("g", "bucket(16,k)")`. */
  def splitSpec(spec: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    spec.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 =>
        if (cur.nonEmpty) out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }

  private val BucketRe = """(?i)bucket\s*\(\s*(\d+)\s*,\s*([^\s)]+)\s*\)""".r
  private val TemporalRe = """(?i)(years|months|days|hours)\s*\(\s*([^\s)]+)\s*\)""".r

  /** Parse a stored `partitionedBy` property value. */
  def parse(spec: String): Seq[Entry] = splitSpec(spec).map {
    case BucketRe(n, c) => BucketPart(n.toInt, c)
    case TemporalRe(u, c) => TemporalPart(u.toLowerCase, c)
    case c => IdentityPart(c)
  }

  def spellingOf(entries: Seq[Entry]): String = entries.map(_.spelling).mkString(",")

  /** The key-column types the bucket hash is defined over — the same
    * families the Bloom sidecar accepts, for the same reason: equality
    * must hash identically wherever it is computed. */
  private def bucketable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Validate + convert V2 DDL transforms. `schema` is the DECLARED
    * (user) schema — generated cluster columns are appended after. */
  def fromTransforms(partitions: Array[Transform],
                     schema: StructType): Seq[Entry] = {
    def oneRef(t: Transform): String = {
      require(t.references.length == 1 &&
          t.references()(0).fieldNames.length == 1,
        s"graft catalog: PARTITIONED BY ${t.describe()} must reference " +
          "exactly one top-level column")
      val c = t.references()(0).fieldNames()(0)
      require(schema.fieldNames.contains(c),
        s"graft catalog: PARTITIONED BY column '$c' not in table schema " +
          s"${schema.fieldNames.mkString("[", ", ", "]")}")
      c
    }
    val entries = Option(partitions).getOrElse(Array.empty[Transform]).toSeq.map {
      case t if t.name == "identity" => IdentityPart(oneRef(t))
      case t if t.name == "bucket" =>
        val c = oneRef(t)
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.dataType == IntegerType => l.value.asInstanceOf[Int]
        }.getOrElse(throw new IllegalArgumentException(
          s"graft catalog: ${t.describe()} carries no integer bucket count"))
        require(n > 0, s"graft catalog: bucket count must be positive, got $n")
        val dt = schema(schema.fieldIndex(c)).dataType
        require(bucketable(dt),
          s"graft catalog: bucket($n, $c) over ${dt.simpleString} " +
            "unsupported — the bucket hash is defined for integral and " +
            "string keys (equality must hash identically at write, scan " +
            "and join planning)")
        BucketPart(n, c)
      case t if TemporalUnits.contains(t.name) =>
        val c = oneRef(t)
        val dt = schema(schema.fieldIndex(c)).dataType
        require(dt == TimestampType || dt == TimestampNTZType ||
            (dt == DateType && t.name != "hours"),
          s"graft catalog: ${t.name}($c) over ${dt.simpleString} " +
            "unsupported — temporal transforms want a timestamp " +
            "(or date, below hours) column")
        TemporalPart(t.name, c)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: PARTITIONED BY ${other.describe()} unsupported — " +
          "identity, bucket(n, col) and years/months/days/hours(col) " +
          "map to the clustered file-stats layout; truncate has no " +
          "mapping here")
    }
    // a generated cluster column must not collide with a user column
    entries.foreach {
      case e @ (_: BucketPart | _: TemporalPart) =>
        require(!schema.fieldNames.contains(e.clusterCol),
          s"graft catalog: PARTITIONED BY ${e.spelling} derives column " +
            s"'${e.clusterCol}', which already exists in the schema — " +
            "rename the existing column")
      case _ => ()
    }
    require(entries.map(_.clusterCol).distinct.length == entries.length,
      "graft catalog: PARTITIONED BY transforms derive duplicate columns: " +
        entries.map(_.spelling).mkString(", "))
    entries
  }

  /** Type/shape validation for parsed entries (the DDL path validates
    * through [[fromTransforms]]; partition-spec EVOLUTION re-parses a
    * property string and validates here). */
  def validate(entries: Seq[Entry], schema: StructType): Unit = {
    entries.foreach { e =>
      require(schema.fieldNames.contains(e.sourceCol),
        s"graft catalog: partitionedBy column '${e.sourceCol}' not in " +
          s"table schema ${schema.fieldNames.mkString("[", ", ", "]")}")
      val dt = schema(schema.fieldIndex(e.sourceCol)).dataType
      e match {
        case BucketPart(n, c) =>
          require(n > 0,
            s"graft catalog: bucket count must be positive, got $n")
          require(bucketable(dt),
            s"graft catalog: bucket($n, $c) over ${dt.simpleString} " +
              "unsupported — integral and string keys only")
        case TemporalPart(u, c) =>
          require(dt == TimestampType || dt == TimestampNTZType ||
              (dt == DateType && u != "hours"),
            s"graft catalog: $u($c) over ${dt.simpleString} unsupported — " +
              "temporal transforms want a timestamp (or date, below " +
              "hours) column")
        case _: IdentityPart => ()
      }
    }
    require(entries.map(_.clusterCol).distinct.length == entries.length,
      "graft catalog: partitionedBy transforms derive duplicate columns: " +
        entries.map(_.spelling).mkString(", "))
  }

  /** The generated column's SQL — Spark's `hash()` is Murmur3 seed 42,
    * matching [[GraftBucketFunction]] exactly. */
  def bucketExprSql(n: Int, col: String): String = s"pmod(hash(`$col`), $n)"

  /** Temporal truncation SQL per unit. Hours keep TIMESTAMP (NTZ for
    * an NTZ source — truncated by field extraction, so no timezone
    * coercion round-trip touches the value), the rest truncate to
    * DATE — all monotone in the source, so a time-range predicate
    * prunes through the cluster column's file stats. */
  def temporalExprSql(unit: String, col: String,
                      src: DataType = TimestampType): String = unit match {
    case "years" => s"make_date(year(`$col`), 1, 1)"
    case "months" => s"make_date(year(`$col`), month(`$col`), 1)"
    case "days" => s"cast(`$col` as date)"
    case "hours" if src == TimestampNTZType =>
      s"make_timestamp_ntz(year(`$col`), month(`$col`), day(`$col`), " +
        s"hour(`$col`), 0, 0)"
    case "hours" => s"date_trunc('HOUR', `$col`)"
  }

  /** The GENERATED specs for the derived cluster columns. */
  def generatedSpecs(entries: Seq[Entry],
                     schema: StructType): Seq[AutoColumns.Generated] =
    entries.collect {
      case BucketPart(n, c) =>
        AutoColumns.Generated(s"${c}_bucket", bucketExprSql(n, c))
      case TemporalPart(u, c) =>
        AutoColumns.Generated(s"${c}_$u",
          temporalExprSql(u, c, schema(schema.fieldIndex(c)).dataType))
    }

  /** The derived cluster columns to append to the declared schema.
    * Each carries a NULL column DEFAULT so an INSERT can simply omit
    * it (the analyzer pads NULL; the writer computes the value — the
    * same "omitted = null" contract every generated column has). */
  def derivedFields(entries: Seq[Entry], schema: StructType): Seq[StructField] = {
    import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
    def meta = new MetadataBuilder()
      .putString(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY, "NULL")
      .putString(ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY, "NULL")
      .build()
    entries.collect {
      case b: BucketPart =>
        StructField(b.clusterCol, IntegerType, nullable = true, metadata = meta)
      case t: TemporalPart =>
        val src = schema(schema.fieldIndex(t.sourceCol)).dataType
        val dt = t.unit match {
          case "hours" => if (src == TimestampNTZType) TimestampNTZType
                          else TimestampType
          case _ => DateType
        }
        StructField(t.clusterCol, dt, nullable = true, metadata = meta)
    }
  }

  /** The V2 Transform report for DESCRIBE / `Table.partitioning()`. */
  def toV2(entries: Seq[Entry]): Array[Transform] = entries.map {
    case IdentityPart(c) => Expressions.identity(c)
    case BucketPart(n, c) => Expressions.bucket(n, c)
    case TemporalPart(u, c) => u match {
      case "years" => Expressions.years(c)
      case "months" => Expressions.months(c)
      case "days" => Expressions.days(c)
      case "hours" => Expressions.hours(c)
    }
  }.toArray

  /** Spark's `hash()` (Murmur3 seed 42) over one value — the write
    * ordering, the generated column and the SPJ function must agree. */
  private[sources] def sparkHash(dt: DataType, v: Any): Int = v match {
    case null => 42
    case x: Long => Murmur3_x86_32.hashLong(x, 42)
    case x: Int => Murmur3_x86_32.hashInt(x, 42)
    case x: Short => Murmur3_x86_32.hashInt(x.toInt, 42)
    case x: Byte => Murmur3_x86_32.hashInt(x.toInt, 42)
    case x: org.apache.spark.unsafe.types.UTF8String =>
      Murmur3_x86_32.hashUnsafeBytes(x.getBaseObject, x.getBaseOffset,
        x.numBytes, 42)
    case other => throw new UnsupportedOperationException(
      s"graft bucket: unhashable value class ${other.getClass.getName}")
  }

  private[sources] def bucketId(dt: DataType, v: Any, n: Int): Int = {
    val h = sparkHash(dt, v)
    ((h % n) + n) % n
  }

  /** Bucket id of a pushed-filter EXTERNAL value (V1 filter literals:
    * boxed numerics, java.lang.String). None = unhashable class —
    * never prune on it. */
  private[sources] def bucketIdOfExternal(v: Any, n: Int): Option[Int] = {
    val h = v match {
      case x: java.lang.Long => Some(Murmur3_x86_32.hashLong(x, 42))
      case x: java.lang.Integer => Some(Murmur3_x86_32.hashInt(x, 42))
      case x: java.lang.Short => Some(Murmur3_x86_32.hashInt(x.intValue(), 42))
      case x: java.lang.Byte => Some(Murmur3_x86_32.hashInt(x.intValue(), 42))
      case x: String =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(x)
        Some(Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
          u.numBytes, 42))
      case x: org.apache.spark.unsafe.types.UTF8String =>
        Some(Murmur3_x86_32.hashUnsafeBytes(x.getBaseObject, x.getBaseOffset,
          x.numBytes, 42))
      case _ => None
    }
    h.map(x => ((x % n) + n) % n)
  }
}

/** `bucket(n, col)` as a V2 catalog function: Spark's SPJ machinery
  * resolves partition-transform names through the table's
  * FunctionCatalog (the Iceberg pattern) — both to type-check the
  * reported `KeyGroupedPartitioning` and to evaluate the write-side
  * clustering order. Semantics are exactly the generated column's SQL
  * (`pmod(hash(col), n)`, Murmur3 seed 42; `hash(NULL)` is the seed,
  * so NULL keys land in a real bucket deterministically). */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) — pmod(hash(col), n), the graft partition transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket wants (numBuckets INT, key), got ${inputType.simpleString}")
    require(inputType(0).dataType == IntegerType,
      s"bucket count must be INT, got ${inputType(0).dataType.simpleString}")
    val kt = inputType(1).dataType
    kt match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        new GraftBucketBound(kt)
      case dt => throw new UnsupportedOperationException(
        s"bucket over ${dt.simpleString} unsupported — integral and " +
          "string keys only")
    }
  }
}

private[sources] class GraftBucketBound(keyType: DataType)
  extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // SPJ compatibility compares transforms by canonical name + bucket
  // count: scope by key type so an INT-keyed and a BIGINT-keyed table
  // (whose hashes differ on equal numeric values) never co-partition
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow)
      : Integer = {
    val n = input.getInt(0)
    val v: Any =
      if (input.isNullAt(1)) null
      else keyType match {
        case LongType => input.getLong(1)
        case IntegerType => input.getInt(1)
        case ShortType => input.getShort(1)
        case ByteType => input.getByte(1)
        case StringType => input.getUTF8String(1)
        case _ => null
      }
    Int.box(PartitionTransforms.bucketId(keyType, v, n))
  }
}
