package graft.sources

import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, EqualNullSafe, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.connector.expressions.{
  Expressions, NamedReference}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Runtime (dynamic) scan filtering for the graft DSv2 door — the
  * `SupportsRuntimeFiltering` role Iceberg's `SparkBatchQueryScan.filter`
  * plays (public contract: `org.apache.spark.sql.connector.read.
  * SupportsRuntimeFiltering`, consumed by Spark's `PartitionPruning`
  * optimizer rule and applied by `BatchScanExec.filteredPartitions`).
  *
  * Why this exists: Spark's own DSv2 `FileScan` does NOT implement the
  * interface, so a catalog-resolved graft table in a star join got no
  * dynamic partition pruning — the classic 100 TB pattern
  * (`fact JOIN dim ON fact.part_col = dim.key WHERE dim.selective`)
  * scanned every fact partition even though the dim side reduces the
  * join keys to a handful of values at runtime. The reference's gold
  * fact table is exactly this shape (partitioned fact joined to filtered
  * dims — reference: src/gold/facts/fact_adverse_events.py:325, the
  * partitioned fact write).
  *
  * One mechanism buys THREE prunings, because the runtime predicates are
  * re-injected into [[TableLogFileIndex.listFiles]]'s two channels:
  *
  *  - join key IS a visible hive partition column → classic dynamic
  *    partition pruning (directory-level, from the manifest);
  *  - join key is the SOURCE of a hidden-partitioning transform
  *    (`bucket(n, k)` / `truncate(w, k)` / `days(ts)`) → dynamic
  *    bucket/layout pruning — the Iceberg transform-aware runtime
  *    filtering Spark cannot do itself because nothing in the schema
  *    relates the layout directory to the source column;
  *  - any surviving file is still subject to the manifest `#stats=`
  *    min/max check against the runtime values → dynamic file skipping
  *    on clustered keys.
  *
  * Safety: translation is exact-or-dropped. A filter shape we cannot
  * translate prunes NOTHING (the join itself re-filters every row, so
  * under-pruning is only a missed optimization, never a wrong answer);
  * a translated filter evaluates the same predicate the engine would,
  * against manifest-held partition values and stats.
  */
private[sources] case class GraftRuntimePruneCtx(
    index: TableLogSnapshotIndex,
    // physical on-disk hive partition schema (hidden layout dirs included)
    partSchema: StructType,
    // physical names of the USER-VISIBLE hive partition columns
    visiblePartPhys: Seq[String],
    // physical source-column names of hidden-partitioning transforms
    transformSourcesPhys: Seq[String],
    // logical -> physical column rename map (ALTER TABLE column mapping)
    l2p: Map[String, String],
    // physical data schema: types for transform-source literals
    physDataSchema: StructType)

private[sources] object GraftRuntimePrune {

  /** Columns a runtime join filter can prune on, in LOGICAL (relation
    * output) names — Spark resolves these against the scan relation
    * (`V2ExpressionUtils.resolveRefs`) before inserting a DPP subquery.
    */
  def filterAttributes(ctx: GraftRuntimePruneCtx): Array[NamedReference] = {
    val p2l = ctx.l2p.map(_.swap)
    (ctx.visiblePartPhys ++ ctx.transformSourcesPhys).distinct
      .map(phys => Expressions.column(p2l.getOrElse(phys, phys)))
      .toArray
  }

  /** Translate the engine-delivered V1 filters (DPP emits `In` over the
    * collected build-side values; `EqualTo`/`EqualNullSafe` cover the
    * single-value case) into catalyst expressions for the file index's
    * two pruning channels: (hive-partition filters, data filters).
    */
  def translate(ctx: GraftRuntimePruneCtx, filters: Array[Filter])
      : (Seq[Expression], Seq[Expression]) = {
    val part = Seq.newBuilder[Expression]
    val data = Seq.newBuilder[Expression]

    def emit(logicalName: String, values: Seq[Any]): Unit = {
      val phys = ctx.l2p.getOrElse(logicalName, logicalName)
      if (ctx.visiblePartPhys.contains(phys)) {
        val dt = ctx.partSchema(phys).dataType
        val attr = AttributeReference(phys, dt)()
        // an EMPTY build side means no key can ever match: every
        // partition is prunable (catalyst In requires a non-empty list)
        part += (if (values.isEmpty) Literal.FalseLiteral
                 else In(attr, values.map(v => Literal.create(v, dt))))
      } else if (ctx.transformSourcesPhys.contains(phys) &&
                 ctx.physDataSchema.fieldNames.contains(phys)) {
        val dt = ctx.physDataSchema(phys).dataType
        val attr = AttributeReference(phys, dt)()
        if (values.isEmpty) part += Literal.FalseLiteral
        else data += In(attr, values.map(v => Literal.create(v, dt)))
      } // any other column: drop — pruning is best-effort
    }

    filters.foreach {
      case sources.In(a, vs)           => emit(a, vs.toIndexedSeq)
      case sources.EqualTo(a, v)       => emit(a, Seq(v))
      case sources.EqualNullSafe(a, v) => emit(a, Seq(v))
      case _                           => () // untranslatable: no pruning
    }
    (part.result(), data.result())
  }
}
