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

  val names: Seq[String] = Seq("morton2", "bucket")

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase match {
      case "morton2" => Some(Morton2)
      case "bucket" => Some(BucketFn)
      case _ => None
    }

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
}
