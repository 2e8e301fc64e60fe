package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a space-separated text — the input
  * stage of every text-dedup operator (q33/q39/q40). Semantically equal
  * to array_distinct(transform(sequence(...), concat_ws(...))) over
  * split(text, " "), but a SINGLE native pass with a hash-set dedup
  * instead of four nested interpreted higher-order functions; first-seen
  * order preserved (array_distinct semantics).
  *
  * CodegenFallback: the per-row work is one java loop; splitting codegen
  * here buys nothing measurable, and fallback keeps the expression tree
  * simple. */
final case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[UTF8String].toString.split(" ", -1)
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
    new GenericArrayData(
      seen.iterator.asScala.map(s => UTF8String.fromString(s): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}

/** Winnowing fingerprints (the MOSS scheme, q50): base-31 polynomial
  * hashes over character k-grams, then the minimum of each w-window of
  * consecutive gram hashes; distinct minima in first-seen order. One
  * native pass — semantically identical to the transform/sequence/
  * array_min HOF pipeline (codepoint arithmetic, exact int64) but without
  * per-character interpreted substr/ascii evaluation.
  *
  * CodegenFallback: per-row java loop, same rationale as WordShingles. */
final case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    // CODEPOINTS, not UTF-16 units — matches ord()/length() semantics on
    // both engines for any text, not just the BMP
    val cps = input.asInstanceOf[UTF8String].toString
      .codePoints().toArray
    val n = cps.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = h * 31L + cps(i + j).toLong
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](nGrams * 2)
    var st = 0
    while (st + w <= nGrams) {
      var mn = hashes(st)
      var j = 1
      while (j < w) {
        if (hashes(st + j) < mn) mn = hashes(st + j)
        j += 1
      }
      seen.add(mn)
      st += 1
    }
    new GenericArrayData(
      seen.iterator.asScala.map(l => l.longValue(): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(
      WinnowFingerprints(ColumnBridge.expression(text), k, w))
}

/** Engine-agnostic string hash: base-31 polynomial over codepoints,
  * reduced mod 2147483647 (the Mersenne prime 2^31-1) at every step so no
  * intermediate exceeds int64 — which makes the SAME value computable in
  * ANSI SQL (DuckDB: `list_reduce([0] || codepoints, (a,c) ->
  * (a*31+c) % 2147483647)`). This is what lets MinHash (q40) and SimHash
  * (q41) signatures be verified by the SQL oracle instead of an
  * engine-specific xxhash64: every downstream seed-mix is an affine map
  * mod the same prime, identical on both engines.
  *
  * Output range [0, 2^31): small enough that `h * mixConstant` (constants
  * < 2^32) never overflows int64 on either engine — DuckDB *errors* on
  * BIGINT overflow rather than wrapping, so boundedness is correctness,
  * not just hygiene.
  *
  * CodegenFallback: per-row java loop, same rationale as WordShingles. */
final case class PolyHashMod(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash_mod requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    PolyHashMod.hash(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): PolyHashMod =
    copy(child = newChild)
}

object PolyHashMod {
  def apply(text: Column): Column =
    ColumnBridge.column(PolyHashMod(ColumnBridge.expression(text)))

  /** The scalar form (shared with driver-side probe sites, e.g. the
    * manifest-bloom string probes). */
  def hash(s: String): Long = {
    val cps = s.codePoints().toArray
    var h = 0L
    var i = 0
    while (i < cps.length) {
      h = (h * 31L + cps(i).toLong) % 2147483647L
      i += 1
    }
    h
  }
}

/** Rolling K-token window hashes over a token array, in ONE pass: each
  * token [[PolyHashMod]]-hashed once, windows combined by the base-B
  * Horner polynomial mod 2^31−1, and each subsequent window derived
  * from the previous in O(1) — subtract the outgoing token's
  * B^(K−1)-weighted term, shift, add the incoming token. Total O(len),
  * replacing ExactSubstr's declarative transform∘aggregate∘slice form,
  * which re-folded K terms per position (O(len·K)) and materialized a
  * K-slice array per window. Values are IDENTICAL to the declarative
  * fold (same B, same per-step mod), so the DuckDB-facing contracts
  * are untouched; all intermediates stay under 2^62 (operands < 2^31,
  * B < 2^20).
  *
  * CodegenFallback: per-row java loop, same rationale as WordShingles —
  * the loop IS the optimization; wrapping it in codegen would only
  * inline the call. */
final case class WindowPolyHash(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  private val B = 1000003L
  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"window_poly_hash requires array<string> and k >= 1, got " +
          s"${child.dataType.catalogString}, k=$k")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val cps = arr.getUTF8String(i).toString.codePoints().toArray
      var h = 0L
      var j = 0
      while (j < cps.length) {
        h = (h * 31L + cps(j).toLong) % P
        j += 1
      }
      th(i) = h
      i += 1
    }
    var bk = 1L // B^(k-1) mod P
    i = 0
    while (i < k - 1) { bk = (bk * B) % P; i += 1 }
    val out = new Array[Long](n - k + 1)
    var wh = 0L
    i = 0
    while (i < k) { wh = (wh * B + th(i)) % P; i += 1 }
    out(0) = wh
    i = 1
    while (i <= n - k) {
      val sub = (th(i - 1) * bk) % P
      wh = (((wh - sub + P) % P) * B + th(i + k - 1)) % P
      out(i) = wh
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WindowPolyHash = copy(child = newChild)
}

object WindowPolyHash {
  def apply(tokens: Column, k: Int): Column =
    ColumnBridge.column(WindowPolyHash(ColumnBridge.expression(tokens), k))
}

/** SimHash-64 over pre-hashed tokens (Array[Long]): each hash votes ±1
  * per bit; the fingerprint bit is the vote sign. Fully codegen'd — one
  * pass with a local long[64] vote table, replacing 64 separate
  * interpreted `aggregate` HOF expressions (which each re-walked the
  * token array). */
final case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint> token hashes, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val m = hs.numElements()
    while (i < m) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |int[] $votes = new int[64];
         |int $m = $a.numElements();
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
}
