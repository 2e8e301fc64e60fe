package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Deterministic, ENGINE-AGNOSTIC count-min sketch (E14 sketch tier,
  * the frequency companion to [[BloomSketch]]'s membership): build over
  * an integer key column as a [[TypedImperativeAggregate]] whose buffer
  * is a d×w counter matrix — partial buffers ADD elementwise, so the
  * build is one map-side-combined pass with a fixed-size state no
  * matter the key cardinality. `estimate(key) = min over rows r of
  * counter[r][pos(key,r)]` never undercounts (every increment for the
  * key landed in every probed cell) and overcounts only by hash-
  * collision mass — the classic CM guarantee.
  *
  * The 100 TB use: per-key frequency WITHOUT a per-key shuffle — hot-key
  * detection that feeds the salting/skew-split decision, frequency caps
  * for dedup sampling, approximate term counts — all from one ~32 KB
  * broadcastable binary where the exact groupBy would shuffle the full
  * key space.
  *
  * Probe rows reuse the Kirsch–Mitzenmacher double hashing of
  * [[BloomSketch]] (`pos_r = (h1 + r·h2) mod w`, pure int64 affine
  * arithmetic mod 2^31−1), so an external engine reproduces the counter
  * matrix — and therefore every estimate, collisions included — EXACTLY:
  * the q94 DuckDB oracle rebuilds `counter[r][p] = Σ n over keys hashing
  * to (r,p)` relationally and takes the same min.
  */
object CountMin {
  /** Depth (number of hash rows) — fixed engine-wide so the serialized
    * matrix is self-describing: width = bytes.length / 8 / D. */
  val D = 4

  /** Estimate helper (also the codegen call target). Counters are
    * little-endian int64, row-major: cell (r, p) at byte offset
    * (r*w + p) * 8. */
  def estimate(cells: Array[Byte], key: Long): Long = {
    val w = cells.length / 8 / D
    var best = Long.MaxValue
    var r = 0
    while (r < D) {
      val p = BloomSketch.pos(key, r, w)
      val off = (r * w + p) * 8
      var v = 0L
      var b = 7
      while (b >= 0) { v = (v << 8) | (cells(off + b) & 0xffL); b -= 1 }
      if (v < best) best = v
      r += 1
    }
    best
  }

  /** Column form of the build aggregate. */
  def build(key: Column, width: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(CmsBuild(expression(key), width).toAggregateExpression())
  }

  /** Column form of the point estimate. */
  def estimateCol(cms: Column, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(CmsEstimate(expression(cms), expression(key)))
  }
}

/** Build aggregate: d×w long counters, elementwise-add merge, BinaryType
  * result of D*w*8 little-endian bytes. Width is a plan-time literal. */
final case class CmsBuild(child: Expression, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0, s"width must be positive: $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_build requires an integer key, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](CountMin.D * width)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      var r = 0
      while (r < CountMin.D) {
        buf(r * width + BloomSketch.pos(key, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    var i = 0
    while (i < buf.length) {
      var v = buf(i)
      var b = 0
      while (b < 8) { bytes(i * 8 + b) = (v & 0xff).toByte; v >>>= 8; b += 1 }
      i += 1
    }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) {
      var v = 0L
      var b = 7
      while (b >= 0) { v = (v << 8) | (bytes(i * 8 + b) & 0xffL); b -= 1 }
      buf(i) = v
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsBuild =
    copy(child = newChildren.head)
}

/** Point estimate: `cms_estimate(cms, key)` — min over the D probed
  * cells. Codegen emits a static call — no boxing per fact row. */
final case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate(cms binary, key integer) got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(cms: Any, key: Any): Any = {
    val k = key match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    CountMin.estimate(cms.asInstanceOf[Array[Byte]], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (cms, key) =>
      s"graft.functions.CountMin.estimate($cms, (long)($key))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
