package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (§2.6's declared UDTF tier): emit the
  * distinct word n-gram shingles of a text as ROWS — the generator form
  * of [[WordShingles]], replacing `explode(array_distinct(split(...)))`
  * in the hot index-build pipelines (q105/q121).
  *
  * Why a generator instead of explode-of-an-array-expression: the
  * built-in pipeline materializes two intermediate arrays per row
  * (split's token array, array_distinct's copy) before Generate walks
  * the result; this node builds ONE deduped shingle array in a single
  * pass over the text and — because it is a [[CollectionGenerator]]
  * with `doGenCode` (NOT CodegenFallback) — `GenerateExec` keeps the
  * whole row-emission loop inside WHOLE-STAGE CODEGEN, where an
  * explode over a CodegenFallback expression would stage the array
  * through an interpreted call. Dedup-during-build also shrinks the
  * emitted row count before the downstream exchange, which is where
  * the 100 TB cost lives.
  *
  * First-seen order, `array_distinct` semantics — bit-compatible with
  * `explode(WordShingles(text, n))`, so swapping it into an oracle-
  * gated pipeline changes no result. */
final case class ShingleGenerate(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def position: Boolean = false
  override def inline: Boolean = false
  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)
  override def collectionType: DataType =
    ArrayType(StringType, containsNull = false)
  override def dataType: DataType = collectionType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_gen requires a string input, got ${child.dataType.catalogString}")

  /** Interpreted row emission (non-codegen GenerateExec path). */
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val arr = ShingleGenerate.shingleArray(t.asInstanceOf[UTF8String], n)
      (0 until arr.numElements()).map(i =>
        InternalRow(arr.getUTF8String(i)))
    }
  }

  /** Codegen: the COLLECTION contract of CollectionGenerator — emit the
    * deduped shingle ArrayData in one static call; GenerateExec's
    * codeGenCollection inlines the per-element emission loop into the
    * enclosing WholeStageCodegen stage. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleGenerate.shingleArray($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleGenerate = copy(child = newChild)
}

object ShingleGenerate {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleGenerate(ColumnBridge.expression(text), n))

  /** Single-pass distinct shingle build (static forwarder target for
    * the generated code). */
  def shingleArray(text: UTF8String, n: Int): ArrayData = {
    val ws = text.toString.split(" ", -1)
    if (ws.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](ws.length * 2)
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(ws(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
