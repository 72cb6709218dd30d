package graft.sources

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.read.{
  Batch, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns,
  SupportsReportStatistics}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Column-mapping shim for the DSv2 read path: the catalog's table
  * schema speaks LOGICAL names (post-`ALTER TABLE RENAME COLUMN`), the
  * files and the inner scan ([[ParquetScanBuilder]] or
  * [[GraftMorScanBuilder]]) speak ON-DISK names. This wrapper translates
  * at the plan boundary only — pruned columns and pushed filters rename
  * logical→physical on the way in, `readSchema` renames physical→logical
  * on the way out — and delegates `toBatch` UNCHANGED: rows are
  * positional, identical types in identical order, so the hot path (the
  * stock vectorized reader, or the MoR reader chain) runs with zero
  * per-row overhead. The same shape as Delta's column-mapping scan and
  * Iceberg's name-mapping, re-expressed over Spark's scan interfaces.
  *
  * Trade documented in [[graft.core.TableLog.alterSchema]]'s scaladoc:
  * aggregate pushdown (a [[ParquetScanBuilder]] extra) is not forwarded
  * for renamed tables — plans fall back to a normal scan + aggregate,
  * never to wrong results. EXPLAIN shows pushed filters under their
  * on-disk names.
  */
private[sources] class GraftMappedScanBuilder(
    inner: ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters,
    l2p: Map[String, String])
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownCatalystFilters {

  private val p2l = l2p.map(_.swap)

  private def rename(s: StructType, m: Map[String, String]): StructType =
    StructType(s.fields.map(f =>
      if (m.contains(f.name)) f.copy(name = m(f.name)) else f))

  private def renameExpr(e: Expression, m: Map[String, String]): Expression =
    e.transform {
      case a: AttributeReference if m.contains(a.name) => a.withName(m(a.name))
    }

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(rename(requiredSchema, l2p))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters.map(renameExpr(_, l2p)))
      .map(renameExpr(_, p2l))

  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  override def build(): Scan = new GraftMappedScan(inner.build(), p2l)
}

private[sources] class GraftMappedScan(inner: Scan, p2l: Map[String, String])
  extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType =
    StructType(inner.readSchema().fields.map(f =>
      if (p2l.contains(f.name)) f.copy(name = p2l(f.name)) else f))

  override def toBatch: Batch = inner.toBatch

  override def description(): String = s"GraftMapped(${inner.description()})"

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
}
