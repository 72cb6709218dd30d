package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native text-hashing expressions.
  *
  * The HOF formulations in [[graft.ops.Dedup]] / [[graft.ops.TextAnalysis]]
  * evaluate every lambda interpreted (one closure call per token/shingle,
  * with a fresh md5 → substring → conv → cast expression chain each) —
  * per-document cost that dominates the dedup family at any scale. These
  * kernels fuse tokenize → shingle → md5 → permute/vote into ONE call per
  * document; the expressions below invoke them from inside whole-stage
  * codegen, so the text path stays a single scan-side projection with no
  * extra stages and ~10x less per-row CPU (measured at sf0.1).
  *
  * Bit-for-bit identical to the HOF path (asserted in TextHashSpec):
  *  - tokens    = split on the regex class `\s+` with empties dropped
  *  - shingles  = n-token windows joined by " "; max(len-n+1, 1) of them
  *  - md5Long   = first 15 hex chars of md5 → 60-bit long
  *    (= `conv(substring(md5(x),1,15),16,10)` = the DuckDB oracle's
  *    `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`)
  */
object TextHash {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 prefix: bytes 0..6 plus the high nibble of byte 7. */
  def md5Long60(bytes: Array[Byte]): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xFFL); i += 1 }
    (v << 4) | ((h(7) & 0xF0L) >>> 4)
  }

  /** Maximal runs of non-`\s` chars — identical to
    * `filter(split(text, "\\s+"), _ =!= "")`. `\s` without UNICODE_CLASS is
    * exactly the six ASCII chars tested here (space \t \n \x0B \f \r).
    */
  def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isSpace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The i-th shingle (0-based) of the token array under the
    * max(len-n+1, 1) convention: `slice` truncates at the end, an empty
    * token array yields the single empty shingle.
    */
  private[functions] def shingleAt(toks: Array[String], i: Int, n: Int): String = {
    val end = math.min(i + n, toks.length)
    if (i >= end) "" // empty-token-array case: one "" shingle
    else {
      val sb = new java.lang.StringBuilder(32)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      sb.toString
    }
  }

  private[functions] def shingleCount(toks: Array[String], n: Int): Int =
    math.max(toks.length - (n - 1), 1)

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    val m = shingleCount(toks, n)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) { out(i) = UTF8String.fromString(shingleAt(toks, i, n)); i += 1 }
    new GenericArrayData(out)
  }

  /** Shannon character entropy in integer micro-bits: counts UNICODE
    * CODEPOINTS (matching Spark `length`/`substring` and DuckDB
    * `len`/`substring` character semantics), rounds each −p·log₂(p) term
    * to micro-bits, sums as longs — term rounding first makes the sum
    * independent of map iteration order. Empty text → 0.
    */
  def charEntropyMicro(text: UTF8String): Long = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
    }
    if (n == 0L) return 0L
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      sum += Math.round(-p * (Math.log(p) / Math.log(2.0)) * 1000000.0)
    }
    sum
  }

  /** Unmasked 60-bit md5 hash of each n-token shingle (winnowing input). */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    val m = shingleCount(toks, n)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = md5Long60(
        shingleAt(toks, i, n).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** MinHash signature: mask each shingle hash to 30 bits, take the min of
    * `(a_p * h + b_p) mod (2^31-1)` per permutation — the exact arithmetic
    * of [[graft.ops.Dedup.withMinhashSignature]] and its DuckDB oracle
    * (constants from [[graft.ops.Dedup.permA]]/`permB`; products stay below
    * 2^61, no overflow in either engine).
    */
  def minhashSigs(text: UTF8String, shingleN: Int, numPerm: Int,
                  permA: Array[Long], permB: Array[Long], permMod: Long,
                  hashMask: Long): ArrayData = {
    val toks = tokenize(text)
    val m = shingleCount(toks, shingleN)
    val sigs = new Array[Long](numPerm)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = md5Long60(shingleAt(toks, i, shingleN)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)) & hashMask
      var p = 0
      while (p < numPerm) {
        val v = (permA(p) * h + permB(p)) % permMod
        if (v < sigs(p)) sigs(p) = v
        p += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  /** SimHash over whitespace tokens: bit b of the result is set iff the
    * ±1 votes of all token-hash bits b sum positive — the exact semantics
    * of [[graft.ops.Dedup.simhashExpr]] (empty doc → 0).
    */
  def simhash(text: UTF8String, bits: Int): Long = {
    val toks = tokenize(text)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val h = md5Long60(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

/** Base for the native text-hash expressions: a string child plus static
  * integer parameters (extracted from foldable literals by the function
  * registry). Codegen emits one static call into [[TextHash]] per row, so
  * the expression lives inside the enclosing WholeStageCodegen stage.
  */
abstract class TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
}

/** `graft_minhash(text, shingleN, numPerm)` → array<long> of length numPerm. */
case class MinhashSigs(child: Expression, shingleN: Int, numPerm: Int)
    extends TextHashExpr {
  import graft.ops.Dedup

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val pa: Array[Long] =
    (0 until numPerm).map(Dedup.permA).toArray
  @transient private lazy val pb: Array[Long] =
    (0 until numPerm).map(Dedup.permB).toArray

  override protected def nullSafeEval(t: Any): Any =
    TextHash.minhashSigs(t.asInstanceOf[UTF8String], shingleN, numPerm,
      pa, pb, Dedup.PermMod, Dedup.HashMask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val paRef = ctx.addReferenceObj("permA", pa, "long[]")
    val pbRef = ctx.addReferenceObj("permB", pb, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = graft.functions.TextHash.minhashSigs($t, $shingleN,
         |  $numPerm, $paRef, $pbRef, ${Dedup.PermMod}L, ${Dedup.HashMask}L);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

/** `graft_simhash(text, bits)` → long. */
case class Simhash(child: Expression, bits: Int) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(t: Any): Any =
    TextHash.simhash(t.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextHash.simhash($t, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Simhash =
    copy(child = newChild)
}

/** `graft_shingles(text, n)` → array<string> of n-token shingles. */
case class Shingles(child: Expression, n: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(t: Any): Any =
    TextHash.shingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextHash.shingles($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** `graft_char_entropy(text)` → long: Shannon character entropy in integer
  * MICRO-bits — Σ over distinct codepoints of round(−p·log₂(p)·10⁶). The
  * per-term micro-rounding makes the long sum independent of iteration
  * order (the [[graft.queries.Num]] policy applied inside a kernel), so
  * the value is reproducible by the DuckDB oracle's unnest formulation.
  * One fused call per document — the unnest/two-aggregation form fans out
  * one row per CHARACTER, which at corpus scale multiplies shuffle input
  * by average document length.
  */
case class CharEntropyMicro(child: Expression) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(t: Any): Any =
    TextHash.charEntropyMicro(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextHash.charEntropyMicro($t);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyMicro =
    copy(child = newChild)
}

/** `graft_shingle_hashes(text, n)` → array<long> (unmasked 60-bit md5). */
case class ShingleHashes(child: Expression, n: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    TextHash.shingleHashes(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextHash.shingleHashes($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
