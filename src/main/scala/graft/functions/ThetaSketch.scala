package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Theta sketches (Apache DataSketches, on Spark's own classpath) — the
  * SET-ALGEBRA sketch tier the HLL surface (q130) cannot provide: theta
  * sketches support INTERSECTION and A-NOT-B estimates, so segment
  * overlap questions ("how many purchasers also signed up") resolve
  * from persisted per-segment sketches without ever rescanning or
  * joining the fact tables. Spark 4 exposes HLL SQL functions but no
  * theta surface; this is the engine's own [[TypedImperativeAggregate]]
  * + scalar estimators over the public datasketches-java API.
  *
  * Determinism: a theta sketch's state is the set of retained key
  * hashes below theta — a pure function of the distinct KEY SET (input
  * order and partitioning change nothing), and the ordered compact
  * serialization is canonical. Below the nominal-entries bound the
  * sketch is in exact mode and every estimate is exactly the true
  * cardinality; above it the estimator is unbiased with ~1/√k error.
  * Merges (Union) are associative and lossless w.r.t. the retained-set
  * semantics, so partial aggregation is safe — the same contract as
  * the engine's Bloom/CMS sketches.
  *
  * The estimators are [[CodegenFallback]] by design: they run on
  * per-GROUP rows after aggregation (thousands, not billions) — unlike
  * the per-fact-row Bloom probe, codegen would buy nothing. */
object Theta {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  val NominalEntries = 4096

  def build(key: Column): Column = column(ThetaBuild(expression(key)))
  def estimate(sk: Column): Column = column(ThetaEstimate(expression(sk)))
  def intersectEstimate(a: Column, b: Column): Column =
    column(ThetaIntersectEstimate(expression(a), expression(b)))
  def aNotBEstimate(a: Column, b: Column): Column =
    column(ThetaAnotBEstimate(expression(a), expression(b)))

  private[functions] def wrap(bytes: Array[Byte]) =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))
}

/** Aggregate: distinct-set sketch of an integer key column. The buffer
  * is a theta Union (which accepts raw key updates AND merged
  * sketches); the result is the ordered compact serialization. */
final case class ThetaBuild(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_build requires an integer key, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(Theta.NominalEntries)
      .buildUnion()

  override def update(buf: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) v match {
      case l: java.lang.Long    => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Theta.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaBuild =
    copy(child = newChildren.head)
}

/** `theta_estimate(sketch)` — distinct-count estimate (exact below the
  * nominal-entries bound). */
final case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires a sketch, got ${other.catalogString}")
  }
  override protected def nullSafeEval(sk: Any): Any =
    Theta.wrap(sk.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** `theta_intersect_estimate(a, b)` — |A ∩ B| estimate. */
final case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_estimate requires two sketches, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val in = SetOperation.builder().buildIntersection()
    in.intersect(Theta.wrap(a.asInstanceOf[Array[Byte]]))
    in.intersect(Theta.wrap(b.asInstanceOf[Array[Byte]]))
    in.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectEstimate =
    copy(left = l, right = r)
}

/** `theta_anotb_estimate(a, b)` — |A \ B| estimate. */
final case class ThetaAnotBEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_anotb_estimate requires two sketches, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.aNotB(Theta.wrap(a.asInstanceOf[Array[Byte]]),
      Theta.wrap(b.asInstanceOf[Array[Byte]])).getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaAnotBEstimate =
    copy(left = l, right = r)
}
