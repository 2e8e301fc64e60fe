package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Deterministic, ENGINE-AGNOSTIC Bloom filter (E14 sketch tier): build
  * over an integer key column as a [[TypedImperativeAggregate]] (the
  * mergeable-bitset shape — partial buffers OR together, so the build is
  * one map-side-combined pass like any sum), probe with a codegen'd
  * scalar expression. The pre-join pruning shape this powers: build on
  * the SMALL side, broadcast the ~100 KB bitset, filter the fact table
  * BEFORE its shuffle — the hand-rolled form of Spark's own runtime
  * bloom-filter injection (spec-pinned in OpsSpec), available where the
  * optimizer can't prove it safe (cross-engine pipelines, persisted
  * filters, decontamination lists shipped to other jobs).
  *
  * Unlike `bloom_filter_agg` (optimizer-internal, xxhash64-based), the
  * probe positions here are pure int64 affine mixes mod 2^31−1 — the
  * [[graft.functions.PolyHashMod]] family — so an external engine can
  * reproduce membership EXACTLY, false positives included: the DuckDB
  * oracle rebuilds the distinct probe-position set and checks all k
  * positions per key relationally (q93). Double hashing: pos_i =
  * (h1 + i·h2) mod m, i < k (Kirsch–Mitzenmacher).
  */
object BloomSketch {
  val P = 2147483647L // 2^31 − 1, the engine's shared hash modulus

  def h1(key: Long): Long = (math.floorMod(key, P) * 2654435761L + 1L) % P
  def h2(key: Long): Long = (math.floorMod(key, P) * 40503L + 97L) % P

  def pos(key: Long, i: Int, mBits: Int): Int =
    ((h1(key) + i * h2(key)) % mBits).toInt

  /** Probe helper (also the codegen call target). */
  def contains(bits: Array[Byte], key: Long, mBits: Int, kHashes: Int): Boolean = {
    var i = 0
    while (i < kHashes) {
      val p = pos(key, i, mBits)
      if ((bits(p >> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Column form of the build aggregate. */
  def build(key: Column, mBits: Int, kHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(BloomBuild(expression(key), mBits, kHashes)
      .toAggregateExpression())
  }

  /** Column form of the probe. */
  def mightContain(bloom: Column, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(BloomContains(expression(bloom), expression(key)))
  }
}

/** Build aggregate: bitset buffer, OR-merge, BinaryType result of
  * m/8 bytes (little-endian bit order: bit j of byte b = position
  * b*8+j). m and k are literals fixed at plan time. */
final case class BloomBuild(child: Expression, mBits: Int, kHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(mBits > 0 && mBits % 8 == 0, s"mBits must be a multiple of 8: $mBits")
  // The serialized sketch is a bare bitset — k is NOT encoded in it, so
  // the probe side always hashes with BloomContains.K. A sketch built
  // with a different k would probe with the wrong hash count and (for
  // k < K) return FALSE NEGATIVES, silently voiding the Bloom
  // guarantee. Refuse the mismatch at build time.
  require(kHashes == BloomContains.K,
    s"kHashes must equal the probe-side BloomContains.K " +
      s"(${BloomContains.K}): got $kHashes — the sketch bytes don't " +
      "encode k, so build and probe must agree")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires an integer key, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      var i = 0
      while (i < kHashes) {
        val p = BloomSketch.pos(key, i, mBits)
        buf(p >> 3) = (buf(p >> 3) | (1 << (p & 7))).toByte
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      a(i) = (a(i) | b(i)).toByte
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): BloomBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuild =
    copy(child = newChildren.head)
}

/** Probe expression: `bloom_contains(bloom, key)` — true iff all k probe
  * positions are set. m and k are recovered from the bitset length and a
  * fixed k channel: k is encoded by the CALLER as a plan-time constant
  * via [[BloomContains.K]]; the default 7 matches q93's build. Codegen
  * emits a static call — no boxing in the fact-table hot path. */
final case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains(bloom binary, key integer) got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(bloom: Any, key: Any): Any = {
    val bits = bloom.asInstanceOf[Array[Byte]]
    val k = key match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    BloomSketch.contains(bits, k, bits.length * 8, BloomContains.K)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bloom, key) =>
      s"graft.functions.BloomSketch.contains($bloom, (long)($key), " +
        s"$bloom.length * 8, ${BloomContains.K})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  /** Probe count — fixed engine-wide so the bitset is self-describing
    * (length ⇒ m) and the probe needs no extra plan state. */
  val K = 7
}
