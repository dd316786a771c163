package graft.sources

import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
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
  * [[temporalExprSql]]). `truncate(n, col)` (Iceberg's remaining
  * standard transform: numeric bins, string prefixes) follows the
  * temporal recipe verbatim — the truncation is MONOTONE in the
  * source (floor-to-multiple for integers via `c - pmod(c, n)`,
  * character prefix for strings), so range-clustering on the RAW key
  * gives every file one truncated value AND a narrow raw slice, and
  * the scan reports `truncate(n, col)` KeyGroupedPartitioning for
  * SPJ (the catalog exports the matching V2 function,
  * [[GraftTruncateFunction]], property-tested bit-equal to the SQL
  * expression). Files whose key column contains NULLs cannot pin a
  * stats value — they degrade SPJ to UnknownPartitioning, never a
  * wrong key.
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

  final case class TruncatePart(width: Int, col: String) extends Entry {
    def spelling: String = s"truncate($width,$col)"
    def clusterCol: String = s"${col}_trunc"
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
  private val TruncateRe = """(?i)truncate\s*\(\s*(\d+)\s*,\s*([^\s)]+)\s*\)""".r
  private val TemporalRe = """(?i)(years|months|days|hours)\s*\(\s*([^\s)]+)\s*\)""".r

  /** Parse a stored `partitionedBy` property value. */
  def parse(spec: String): Seq[Entry] = splitSpec(spec).map {
    case BucketRe(n, c) => BucketPart(n.toInt, c)
    case TruncateRe(n, c) => TruncatePart(n.toInt, c)
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

  /** Types `truncate(n, col)` is defined over: the INT/BIGINT floor
    * (`c - pmod(c, n)`) keeps the source type exactly, and the string
    * prefix keeps StringType — narrower integrals would silently
    * promote under the arithmetic, so they refuse. */
  private def truncatable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType => true
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
      case t if t.name == "truncate" =>
        val c = oneRef(t)
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.dataType == IntegerType => l.value.asInstanceOf[Int]
        }.getOrElse(throw new IllegalArgumentException(
          s"graft catalog: ${t.describe()} carries no integer width"))
        require(n > 0, s"graft catalog: truncate width must be positive, got $n")
        val dt = schema(schema.fieldIndex(c)).dataType
        require(truncatable(dt),
          s"graft catalog: truncate($n, $c) over ${dt.simpleString} " +
            "unsupported — integer bins and string prefixes only " +
            "(INT/BIGINT/STRING)")
        TruncatePart(n, c)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: PARTITIONED BY ${other.describe()} unsupported — " +
          "identity, bucket(n, col), truncate(n, col) and " +
          "years/months/days/hours(col) map to the clustered " +
          "file-stats layout")
    }
    // a generated cluster column must not collide with a user column
    entries.foreach {
      case e @ (_: BucketPart | _: TemporalPart | _: TruncatePart) =>
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
        case TruncatePart(n, c) =>
          require(n > 0,
            s"graft catalog: truncate width must be positive, got $n")
          require(truncatable(dt),
            s"graft catalog: truncate($n, $c) over ${dt.simpleString} " +
              "unsupported — INT/BIGINT/STRING keys only")
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

  /** Truncation SQL per key type — MONOTONE in the source in both
    * families: floor-to-multiple for integers (`pmod` gives the
    * non-negative remainder, so negatives floor instead of rounding
    * toward zero — Iceberg's truncate semantics), character prefix
    * for strings (order-preserving under UTF-8 byte comparison). */
  def truncExprSql(n: Int, col: String, src: DataType): String = src match {
    case StringType => s"substring(`$col`, 1, $n)"
    case _ => s"`$col` - pmod(`$col`, $n)"
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
      case TruncatePart(n, c) =>
        AutoColumns.Generated(s"${c}_trunc",
          truncExprSql(n, c, schema(schema.fieldIndex(c)).dataType))
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
      case t: TruncatePart =>
        // truncation preserves the key's own type
        StructField(t.clusterCol,
          schema(schema.fieldIndex(t.sourceCol)).dataType,
          nullable = true, metadata = meta)
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
    case TruncatePart(n, c) => Expressions.apply("truncate",
      Expressions.literal(n), Expressions.column(c))
  }.toArray

  /** The V2 transforms the SCAN reports for storage-partitioned
    * joins. Identical to [[toV2]] except truncate, whose WIDTH moves
    * into the function NAME (`truncate_<n>(col)`): Spark's
    * KeyGroupedPartitioning admits only single-reference transform
    * expressions (physical/partitioning.scala isSupportedTransform —
    * bucket alone gets its literal special-cased into numBucketsOpt),
    * so a literal width argument would silently disqualify the
    * partitioning. The catalog serves `truncate_<n>` from
    * loadFunction; mismatched widths can never co-partition — their
    * canonical names differ. */
  def spjV2(entries: Seq[Entry]): Array[Transform] = entries.map {
    case TruncatePart(n, c) =>
      Expressions.apply(s"truncate_$n", Expressions.column(c))
    case e => toV2(Seq(e)).head
  }.toArray

  /** Truncation of one value under `keyType` — the single semantics
    * [[GraftTruncateBound]] (2-arg SQL form) and
    * [[GraftTruncateWidthBound]] (SPJ form) share. */
  private[sources] def truncValue(keyType: DataType, width: Int,
                                  v: Any): Any = v match {
    case null => null
    case x: Long => java.lang.Long.valueOf(x - (((x % width) + width) % width))
    case x: Int =>
      java.lang.Integer.valueOf(x - (((x % width) + width) % width))
    case x: org.apache.spark.unsafe.types.UTF8String =>
      x.substringSQL(1, width) // by CHARACTERS, exactly SQL substring
    case other => throw new UnsupportedOperationException(
      s"graft truncate: unsupported value class ${other.getClass.getName}")
  }

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

private[sources] class GraftBucketBound(
    private[sources] val keyType: DataType)
  extends ScalarFunction[Integer] with ReducibleFunction[Integer, Integer] {

  /** MIXED-GRANULARITY co-partitioning (Spark's ReducibleFunction,
    * gated by spark.sql.sources.v2.bucketing
    * .allowCompatibleTransforms.enabled): when this side buckets
    * FINER and the counts divide — bucket(16) vs bucket(8) —
    * `pmod(h, 16) % 8 == pmod(h, 8)`, so reducing this side's bucket
    * ids modulo the coarser count aligns the partitions and the join
    * still skips both exchanges. Different key types never reduce
    * (their hashes live in different spaces); null = no reduction
    * needed (identity), Spark's contract. */
  override def reducer(thisNumBuckets: Int,
                       otherFunction: ReducibleFunction[_, _],
                       otherNumBuckets: Int): Reducer[Integer, Integer] =
    otherFunction match {
      case o: GraftBucketBound
          if o.keyType == keyType && thisNumBuckets > otherNumBuckets &&
            thisNumBuckets % otherNumBuckets == 0 =>
        BucketReducer(otherNumBuckets)
      case _ => null
    }
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

/** `truncate(n, col)` as a V2 catalog function — the SPJ twin of
  * [[GraftBucketFunction]]: Spark resolves the reported
  * KeyGroupedPartitioning transform through the table's
  * FunctionCatalog, and the semantics must be bit-equal to the
  * generated column's SQL (`c - pmod(c, n)` for integers,
  * `substring(c, 1, n)` — by characters — for strings; NULL keys
  * truncate to NULL). */
object GraftTruncateFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(n, col) — floor-to-multiple / string prefix, the graft partition transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"truncate wants (width INT, key), got ${inputType.simpleString}")
    require(inputType(0).dataType == IntegerType,
      s"truncate width must be INT, got ${inputType(0).dataType.simpleString}")
    val kt = inputType(1).dataType
    kt match {
      case IntegerType | LongType | StringType => new GraftTruncateBound(kt)
      case dt => throw new UnsupportedOperationException(
        s"truncate over ${dt.simpleString} unsupported — INT/BIGINT/STRING keys only")
    }
  }
}

private[sources] class GraftTruncateBound(keyType: DataType)
  extends ScalarFunction[Any] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = keyType
  override def name(): String = "truncate"
  // SPJ compatibility scopes by key type: an INT-keyed and a
  // BIGINT-keyed table truncate equal numerics to values that compare
  // differently as partition keys — never co-partition them
  override def canonicalName(): String =
    s"graft.truncate(${keyType.catalogString})"
  override def isResultNullable: Boolean = true
  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = {
    val n = input.getInt(0)
    if (input.isNullAt(1)) null
    else PartitionTransforms.truncValue(keyType, n, keyType match {
      case LongType => input.getLong(1)
      case IntegerType => input.getInt(1)
      case StringType => input.getUTF8String(1)
      case _ => null
    })
  }
}

/** The SPJ spelling of truncate — `truncate_<n>(col)`: width in the
  * NAME, one reference argument, so the transform expression stays
  * inside KeyGroupedPartitioning's supported set (see
  * [[PartitionTransforms.spjV2]]). Resolved by the catalog's
  * loadFunction for any width. */
final case class GraftTruncateWidthFunction(width: Int)
  extends UnboundFunction {
  override def name(): String = s"truncate_$width"
  override def description(): String =
    s"truncate_$width(col) — the width-bound SPJ form of truncate"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"truncate_$width wants (key), got ${inputType.simpleString}")
    val kt = inputType(0).dataType
    kt match {
      case IntegerType | LongType | StringType =>
        new GraftTruncateWidthBound(width, kt)
      case dt => throw new UnsupportedOperationException(
        s"truncate over ${dt.simpleString} unsupported — INT/BIGINT/STRING keys only")
    }
  }
}

private[sources] final case class BucketReducer(otherNumBuckets: Int)
  extends Reducer[Integer, Integer] {
  override def reduce(v: Integer): Integer =
    if (v == null) null else Int.box(v.intValue() % otherNumBuckets)
}

private[sources] class GraftTruncateWidthBound(
    private[sources] val width: Int,
    private[sources] val keyType: DataType)
  extends ScalarFunction[Any] with ReducibleFunction[Any, Any] {

  /** MIXED-WIDTH co-partitioning: when this side truncates FINER than
    * the other — integers: the coarser width is a positive multiple of
    * this one (floor composition: a width-aligned value floors exactly
    * to the coarser bin); strings: the other prefix is shorter (a
    * longer prefix always extends a shorter one) — reducing this
    * side's bin values into the coarser width aligns the partitions.
    * Same key type required; null = identity (no reduction). */
  override def reducer(otherFunction: ReducibleFunction[_, _])
      : Reducer[Any, Any] =
    otherFunction match {
      case o: GraftTruncateWidthBound if o.keyType == keyType &&
          (keyType match {
            case StringType => o.width < width
            case _ => o.width > width && o.width % width == 0
          }) =>
        TruncateReducer(o.width, keyType)
      case _ => null
    }
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType = keyType
  override def name(): String = s"truncate_$width"
  // width AND key type scope compatibility: either differing means the
  // partition values compare in different spaces — never co-partition
  override def canonicalName(): String =
    s"graft.truncate($width, ${keyType.catalogString})"
  override def isResultNullable: Boolean = true
  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any =
    if (input.isNullAt(0)) null
    else PartitionTransforms.truncValue(keyType, width, keyType match {
      case LongType => input.getLong(0)
      case IntegerType => input.getInt(0)
      case StringType => input.getUTF8String(0)
      case _ => null
    })
}

private[sources] final case class TruncateReducer(
    otherWidth: Int, keyType: DataType) extends Reducer[Any, Any] {
  override def reduce(v: Any): Any =
    if (v == null) null
    else PartitionTransforms.truncValue(keyType, otherWidth, v)
}
