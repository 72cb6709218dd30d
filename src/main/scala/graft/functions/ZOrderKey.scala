package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_zorder(x, y)` — 2-D Z-order (Morton) key: interleaves the low 31
  * bits of each input MSB-first into one 62-bit long.
  *
  * Sorting by this key gives a space-filling-curve layout: rows close in
  * BOTH dimensions land in the same files, so per-file parquet min/max
  * statistics are selective for filters on either column — where a
  * single-column sort leaves the second column spanning its full domain in
  * every file. This is the clustering key behind
  * [[graft.core.Maintenance.compact]]'s multi-dimension option (the same
  * idea as Delta's OPTIMIZE ZORDER BY, rebuilt on plain parquet).
  *
  * Callers normalize values into [0, 2^31) first (rank or min/max scale —
  * Maintenance does min/max); inputs are masked defensively.
  */
object ZOrderUtil {
  def interleave2(x: Long, y: Long): Long = {
    val a = x & 0x7FFFFFFFL
    val b = y & 0x7FFFFFFFL
    var out = 0L
    var i = 30
    while (i >= 0) {
      out = (out << 1) | ((a >>> i) & 1L)
      out = (out << 1) | ((b >>> i) & 1L)
      i -= 1
    }
    out
  }
}

case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderUtil.interleave2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}
