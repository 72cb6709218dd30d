package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_unaccent(text)` → string: canonical-decompose (NFD), drop
  * combining marks (Unicode category Mn), recompose (NFC) — the
  * diacritic-stripping half of corpus text canonicalization
  * (é→e, ï→i, ż→z) that leaves non-decomposable letters alone
  * (ł, ß, CJK pass through). Matches DuckDB's `strip_accents` on the
  * shared domain, which is what lets a normalization pipeline be
  * hash-gated cross-engine.
  *
  * Implemented over `java.text.Normalizer` (ICU-equivalent NFD/NFC
  * tables ship with the JDK); the expression itself is codegen'd so the
  * normalization rides whole-stage codegen like the rest of the text
  * family — no UDF boundary.
  */
object Unaccent {
  def unaccent(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val ch = nfd.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }
}

case class UnaccentExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unaccent"

  override protected def nullSafeEval(t: Any): Any =
    Unaccent.unaccent(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Unaccent.unaccent($t)")

  override protected def withNewChildInternal(newChild: Expression): UnaccentExpr =
    copy(child = newChild)
}
