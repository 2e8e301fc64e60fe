package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataTypes, LongType, StructType}

/** Catalog-scoped SQL functions for the lake catalog — the THIRD V2
  * catalog surface next to tables and namespaces
  * (`FunctionCatalog`): `SELECT <cat>.morton2(a, b)` resolves through
  * `loadFunction` to an [[UnboundFunction]], binds against the actual
  * argument schema, and executes through the V2 [[ScalarFunction]]
  * contract. `morton2` carries the MAGIC method (`invoke` with exact
  * primitive signature): Spark's resolver compiles the call into a
  * codegen-friendly `Invoke` on the function instance — no per-row
  * `InternalRow` boxing — falling back to `produceResult` only when
  * the magic lookup fails (both paths implemented and spec-pinned to
  * agree). The `bucket` family deliberately does NOT: its contract
  * routes null keys to bucket 0, and a primitive-arg magic method
  * would null-propagate on the Invoke path — produceResult is its
  * single evaluation path so every caller agrees on nulls.
  *
  * `morton2` is the q107 Z-order curve exposed as a catalog function:
  * pure int64 shifts/masks (engine-exact, DuckDB-restatable), the
  * curve a caller needs to WRITE key-clustered layouts that the
  * lake's footer-stats group pruning (LakeFileStats) and zone-map
  * scans (q96/q107) can then exploit. */
object GraftLakeFunctions {

  val names: Seq[String] =
    Seq("morton2", "bucket", "truncate", "days", "months", "years",
      "hours")

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase match {
      case "morton2" => Some(Morton2)
      case "bucket" => Some(BucketFn)
      case "truncate" => Some(TruncateFn)
      case "days" => Some(timeFn("days"))
      case "months" => Some(timeFn("months"))
      case "years" => Some(timeFn("years"))
      case "hours" => Some(timeFn("hours"))
      case TruncateWRe(w) => Some(truncateWFn(w.toInt))
      case _ => None
    }

  /** Width-curried truncate names (`truncate_w4`): what a
    * truncate-partitioned table's scan REPORTS as its partition
    * transform. Spark's `KeyGroupedPartitioning.satisfies0` requires
    * every leaf of a partition expression to be a clustering key, so
    * the generic 2-arg `truncate(4, s)` — whose width literal is a
    * leaf — can never satisfy a join/agg distribution (bucket only
    * works because Spark hoists its count into `numBucketsOpt`).
    * Encoding the width in the FUNCTION NAME makes the transform
    * single-leaf, and since this catalog serves both sides of any
    * lake⋈lake join, equal names guarantee equal widths. */
  private val TruncateWRe = """truncate_w(\d{1,5})""".r

  /** 2-D Morton (Z-order) interleave of the low 16 bits of each key —
    * bit-identical to `Relational.zValue` (q107) and to the DuckDB
    * restatement in q180's oracle. */
  object Morton2 extends UnboundFunction {
    override def name(): String = "morton2"
    override def description(): String =
      "morton2(a BIGINT, b BIGINT) -> BIGINT: Z-order interleave of " +
        "the low 16 bits of a (even positions) and b (odd positions)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2 ||
        !inputType.fields.forall(_.dataType == LongType))
        throw new UnsupportedOperationException(
          s"morton2 expects (BIGINT, BIGINT), got $inputType")
      Morton2Bound
    }
  }

  object Morton2Bound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(DataTypes.LongType, DataTypes.LongType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      DataTypes.LongType
    override def name(): String = "morton2"
    override def canonicalName(): String = "graft.lake.morton2"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = false

    private def spread(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }

    /** MAGIC method: exact-signature primitive call the resolver
      * compiles to `Invoke` (whole-stage-codegen friendly). Matches
      * q107's `zValue`: non-negative keys mod 65536 interleaved. */
    def invoke(a: Long, b: Long): Long =
      spread(Math.floorMod(a, 65536L)) |
        (spread(Math.floorMod(b, 65536L)) << 1)

    /** Row fallback — must agree with [[invoke]] (spec-pinned). */
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getLong(0), input.getLong(1))
  }

  /** `bucket(n, key)` — the partition-transform function behind
    * `PARTITIONED BY (bucket(n, col))` ([[LakePartitioning]]) and the
    * function Spark's `V2ScanPartitioningAndOrdering` loads (name
    * `bucket`, empty namespace) to resolve a bucket transform into a
    * `TransformExpression` for storage-partitioned joins. Semantics
    * are ENGINE-AGNOSTIC on purpose (DuckDB-restatable, unlike
    * murmur): integral keys route by `floorMod(key, n)`, strings by
    * the [[graft.functions.PolyHashMod]] base-31 polynomial mod n —
    * bit-identical to [[LakePartitioning.routeColumn]]'s write-side
    * routing, which is the SPJ correctness contract (equal keys land
    * in the same bucket on every table and on any Spark-side
    * re-shuffle via `v2.bucketing.shuffle.enabled`). Null keys bucket
    * to 0, matching the write path. */
  object BucketFn extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n INT, key BIGINT|INT|STRING) -> INT: deterministic " +
        "partition bucket (floorMod for integral keys, base-31 " +
        "polynomial hash mod n for strings)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2 ||
        inputType.fields(0).dataType != DataTypes.IntegerType)
        throw new UnsupportedOperationException(
          s"bucket expects (INT n, key), got $inputType")
      inputType.fields(1).dataType match {
        case DataTypes.LongType => BucketLong
        case DataTypes.IntegerType => BucketInt
        case DataTypes.ShortType | DataTypes.ByteType => BucketInt
        case DataTypes.StringType => BucketString
        case other => throw new UnsupportedOperationException(
          s"bucket key must be integral or string, got $other")
      }
    }
  }

  private[sources] def bucketOfLong(n: Int, key: Long): Int =
    Math.floorMod(key, n.toLong).toInt

  private[sources] def bucketOfString(n: Int, key: String): Int = {
    // PolyHashMod: base-31 codepoint polynomial mod 2^31-1, then mod n
    val cps = key.codePoints().toArray
    var h = 0L
    var i = 0
    while (i < cps.length) {
      h = (h * 31L + cps(i).toLong) % 2147483647L
      i += 1
    }
    (h % n.toLong).toInt
  }

  object BucketLong extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(DataTypes.IntegerType, DataTypes.LongType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      DataTypes.IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.lake.bucket"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = false
    // deliberately NO magic invoke method: a primitive-arg `invoke`
    // would null-propagate on the codegen Invoke path while the
    // documented contract (and the write router) buckets null keys
    // to 0 — produceResult is the single evaluation path, so both
    // sides of a one-side-shuffle SPJ agree on nulls
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(1)) 0 else bucketOfLong(input.getInt(0), input.getLong(1))
  }

  object BucketInt extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(DataTypes.IntegerType, DataTypes.IntegerType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      DataTypes.IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.lake.bucket"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = false
    // no magic invoke — see BucketLong's null-contract note
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(1)) 0
      else bucketOfLong(input.getInt(0), input.getInt(1).toLong)
  }

  object BucketString extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(DataTypes.IntegerType, DataTypes.StringType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      DataTypes.IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.lake.bucket"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = false
    // no magic invoke — see BucketLong's null-contract note (the
    // UTF8String overload handled null itself, but Invoke's
    // null-propagation fires BEFORE the method body runs)
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(1)) 0
      else bucketOfString(input.getInt(0), input.getUTF8String(1).toString)
  }

  // ---------------------------------------------------------------------
  // Partition-transform functions (`truncate`, `days`, `months`,
  // `years`, `hours`) — Iceberg's system-function surface, and what
  // Spark's `V2ScanPartitioningAndOrdering` loads to resolve the
  // matching [[LakePartitioning]] transforms into TransformExpressions
  // for storage-partitioned joins. Semantics are bit-identical to the
  // write-side routing ([[LakePartitioning.routeColumn]] /
  // `rowRouter`): session TZ is pinned UTC, so epoch arithmetic here
  // IS the claim the file path records. Null inputs yield null (the
  // Hive null-partition claim), matching the routers; produceResult is
  // the single evaluation path (see the bucket null-contract note).

  object TruncateFn extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w INT, v STRING|BIGINT|INT) -> v's type: Iceberg " +
        "width truncation (first w codepoints / floor to multiple of w)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2 ||
        inputType.fields(0).dataType != DataTypes.IntegerType)
        throw new UnsupportedOperationException(
          s"truncate expects (INT w, v), got $inputType")
      inputType.fields(1).dataType match {
        case DataTypes.LongType => TruncateLong
        case DataTypes.IntegerType => TruncateInt
        case DataTypes.StringType => TruncateString
        case other => throw new UnsupportedOperationException(
          s"truncate value must be integral or string, got $other")
      }
    }
  }

  object TruncateLong extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(DataTypes.IntegerType, DataTypes.LongType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      DataTypes.LongType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.lake.truncate"
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(1)) null
      else LakePartitioning.truncLong(input.getInt(0), input.getLong(1))
  }

  object TruncateInt extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(DataTypes.IntegerType, DataTypes.IntegerType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      DataTypes.IntegerType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.lake.truncate"
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(1)) null
      else LakePartitioning.truncLong(input.getInt(0),
        input.getInt(1).toLong).toInt
  }

  object TruncateString
      extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(DataTypes.IntegerType, DataTypes.StringType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      DataTypes.StringType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.lake.truncate"
    override def isDeterministic: Boolean = true
    override def produceResult(
        input: InternalRow): org.apache.spark.unsafe.types.UTF8String =
      if (input.isNullAt(1)) null
      else org.apache.spark.unsafe.types.UTF8String.fromString(
        LakePartitioning.truncString(input.getInt(0),
          input.getUTF8String(1).toString))
  }

  /** The single-arg, width-curried truncate (see [[TruncateWRe]]):
    * semantics identical to [[TruncateFn]] with the width baked in. */
  private[sources] def truncateWFn(w: Int): UnboundFunction =
    new UnboundFunction {
      override def name(): String = s"truncate_w$w"
      override def description(): String =
        s"truncate_w$w(v STRING|BIGINT|INT) -> v's type: Iceberg " +
          s"width-$w truncation (single-arg form reported for SPJ)"
      override def bind(inputType: StructType): BoundFunction = {
        if (inputType.fields.length != 1)
          throw new UnsupportedOperationException(
            s"truncate_w$w expects one argument, got $inputType")
        inputType.fields(0).dataType match {
          case DataTypes.LongType | DataTypes.IntegerType |
               DataTypes.StringType =>
            new TruncateWBound(w, inputType.fields(0).dataType)
          case other => throw new UnsupportedOperationException(
            s"truncate value must be integral or string, got $other")
        }
      }
    }

  private final class TruncateWBound(w: Int,
      argType: org.apache.spark.sql.types.DataType)
      extends ScalarFunction[Any] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(argType)
    override def resultType(): org.apache.spark.sql.types.DataType = argType
    override def name(): String = s"truncate_w$w"
    override def canonicalName(): String = s"graft.lake.truncate[$w]"
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): Any = {
      if (input.isNullAt(0)) return null
      argType match {
        case DataTypes.LongType =>
          LakePartitioning.truncLong(w, input.getLong(0))
        case DataTypes.IntegerType =>
          LakePartitioning.truncLong(w, input.getInt(0).toLong).toInt
        case _ => org.apache.spark.unsafe.types.UTF8String.fromString(
          LakePartitioning.truncString(w, input.getUTF8String(0).toString))
      }
    }
  }

  /** One UnboundFunction per time transform; binds against DATE or
    * TIMESTAMP/TIMESTAMP_NTZ (hours: timestamps only, a date has no
    * sub-day instant) and yields the Iceberg epoch-unit INT — except
    * `days`, which yields DATE to match the claim type the scan's
    * HasPartitionKey rows carry. */
  private[sources] def timeFn(which: String): UnboundFunction =
    new UnboundFunction {
      override def name(): String = which
      override def description(): String =
        s"$which(ts DATE|TIMESTAMP) -> partition unit (UTC)"
      override def bind(inputType: StructType): BoundFunction = {
        if (inputType.fields.length != 1)
          throw new UnsupportedOperationException(
            s"$which expects one datetime argument, got $inputType")
        val dt = inputType.fields(0).dataType
        val fromDate = dt == DataTypes.DateType
        val ok = dt == DataTypes.DateType ||
          dt == DataTypes.TimestampType ||
          dt == DataTypes.TimestampNTZType
        if (!ok || (which == "hours" && fromDate))
          throw new UnsupportedOperationException(
            s"$which over ${dt.catalogString} is not supported")
        new TimeTransformBound(which, dt, fromDate)
      }
    }

  private final class TimeTransformBound(which: String,
      argType: org.apache.spark.sql.types.DataType, fromDate: Boolean)
      extends ScalarFunction[Any] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(argType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      if (which == "days") DataTypes.DateType else DataTypes.IntegerType
    override def name(): String = which
    override def canonicalName(): String = s"graft.lake.$which"
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): Any = {
      if (input.isNullAt(0)) return null
      val epochDay =
        if (fromDate) input.getInt(0).toLong
        else Math.floorDiv(input.getLong(0), 86400000000L)
      which match {
        case "days" => epochDay.toInt
        case "months" => LakePartitioning.monthsOfEpochDay(epochDay)
        case "years" => LakePartitioning.yearsOfEpochDay(epochDay)
        case "hours" => Math.floorDiv(input.getLong(0), 3600000000L).toInt
      }
    }
  }
}
