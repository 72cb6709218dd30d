package graft.sources

import java.util

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{
  Identifier, SupportsRead, SupportsWrite, Table, TableCapability,
  TableCatalog, TableChange, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{
  LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{
  PartitionDirectory, PartitioningAwareFileIndex, PartitionPath,
  PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.{AlwaysTrue, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL / catalog FRONT DOOR for TableLog tables — the reference's
  * user-facing surface is `spark.table("gold.dim_patient")`,
  * `SELECT ... FROM schema.name`, and `df.write.saveAsTable(...)`
  * everywhere (reference: src/utils/silver_transformations.py:43,
  * src/bronze/ingest_demographics.py:65-67); TableLog snapshots resolve
  * through two standard Spark entry points, BOTH using the same
  * manifest-backed [[TableLogFileIndex]] (partition pruning, min/max
  * skipping, hidden-partitioning transforms — identical physics to the
  * API path):
  *
  *  - `spark.read.format("graft").load(dir)` — [[GraftSource]], a DSv2
  *    `TableProvider` registered under the short name `graft`
  *    (META-INF/services), with `versionAsOf` / `timestampAsOf` options
  *    for time travel;
  *  - `spark.table("graft.<schema>.<name>")` / SQL `FROM graft.s.n` —
  *    [[GraftCatalog]], a `TableCatalog` plugin activated by the runtime
  *    conf `spark.sql.catalog.graft = graft.sources.GraftCatalog` (+
  *    `...graft.warehouse = <root>`); catalogs load LAZILY at first
  *    reference, so this works on driver-owned sessions where
  *    `spark.sql.extensions` is out of reach. `VERSION AS OF` /
  *    `TIMESTAMP AS OF` resolve through the catalog's time-travel
  *    loadTable overloads.
  *
  * Reads: dv/eq-delete-free snapshots take the STOCK DSv2 parquet scan
  * ([[ParquetScanBuilder]] — vectorized reader, column pruning, filter
  * pushdown, whole-stage codegen) over [[TableLogSnapshotIndex]];
  * merge-on-read snapshots (deletion vectors / equality deletes) route
  * through [[GraftMorScanBuilder]], which keeps the same pruning +
  * pushdown and subtracts deleted rows inside the readers — a table that
  * worked yesterday keeps resolving in SQL after a GDPR delete.
  *
  * Writes: `INSERT INTO graft.s.n`, `INSERT OVERWRITE`,
  * `df.writeTo(...).append()/create()`, and `saveAsTable` commit through
  * the SAME TableLog protocol as the API path — atomic create-no-
  * overwrite CAS, optimistic retry/rebase, CHECK-constraint enforcement,
  * optimizeWrite layout, tip-matching hive partitioning and hidden-
  * partitioning transforms ([[graft.core.TableLog.appendLikeTip]]).
  * `CREATE TABLE` persists a schema sidecar so an empty table scans and
  * accepts its first insert; the first commit takes over as the source
  * of truth.
  *
  * Hidden-partitioning layout columns are excluded from the table schema
  * (they stay hidden), while their transform pruning still runs inside
  * `listFiles`.
  */
class TableLogSnapshotIndex(spark: SparkSession, inner: TableLogFileIndex,
                            entries: Seq[(String, Long, Long)], dir: String)
  extends PartitioningAwareFileIndex(spark, Map("mergeSchema" -> "true"), None) {

  override def rootPaths: Seq[Path] = inner.rootPaths

  override def partitionSpec(): PartitionSpec =
    if (inner.partitionSchema.isEmpty)
      PartitionSpec(new StructType(), Seq.empty)
    else PartitionSpec(inner.partitionSchema,
      entries.map(_._1).groupBy(r => r.take(r.lastIndexOf('/') + 1)).toSeq
        .map { case (d, rels) =>
          PartitionPath(inner.partRow(rels.head), new Path(dir, d))
        })

  private def statusOf(rel: String, len: Long, mod: Long): FileStatus =
    new FileStatus(len, false, 1, 128L * 1024 * 1024, mod, new Path(dir, rel))

  override def leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    entries.foreach { case (rel, len, mod) =>
      m += (new Path(dir, rel) -> statusOf(rel, len, mod))
    }
    m
  }

  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    entries.groupBy { case (rel, _, _) =>
      new Path(dir, rel).getParent
    }.map { case (d, es) =>
      d -> es.map { case (rel, len, mod) => statusOf(rel, len, mod) }.toArray
    }

  // RUNTIME (dynamic) filters, installed mid-execution by
  // [[GraftStreamableScan.filter]] once a DPP subquery's build side has
  // materialized — see [[GraftRuntimePrune]]. They ride the same two
  // listFiles channels the static filters use, so partition pruning,
  // hidden-transform pruning, and #stats= skipping all re-engage with
  // the runtime values. Append-only per scan (each query plans over a
  // fresh GraftTable, so the index is never shared across queries).
  @volatile private var rtPartFilters: Seq[Expression] = Nil
  @volatile private var rtDataFilters: Seq[Expression] = Nil
  private[sources] def addRuntimeFilters(part: Seq[Expression],
                                         data: Seq[Expression]): Unit = {
    rtPartFilters ++= part
    rtDataFilters ++= data
  }

  // the whole point: pruning + stats skipping + hidden-partitioning
  // transforms answer from the manifest, identically to the V1 path
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    inner.listFiles(partitionFilters ++ rtPartFilters,
      dataFilters ++ rtDataFilters)

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = inner.sizeInBytes
}

/** Schema sidecar for tables created BEFORE their first commit (`CREATE
  * TABLE`, the createTable half of CTAS): one small file under
  * `_graft_log/` holding the declared schema (json) + identity partition
  * columns. Authoritative only while the table has no versions — the
  * first commit's data files take over.
  */
private[sources] object GraftTableSidecar {
  private def path(dir: String) = new Path(new Path(dir, "_graft_log"), ".table-def")

  def write(spark: SparkSession, dir: String, schema: StructType,
            partCols: Seq[String]): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir, "_graft_log"))
    val out = fs.create(path(dir), true)
    try out.write((schema.json + "\n" + partCols.mkString(",") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): Option[(StructType, Seq[String])] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = path(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      val schema = org.apache.spark.sql.types.DataType.fromJson(lines.head)
        .asInstanceOf[StructType]
      val parts = lines.drop(1).headOption.map(_.trim).filter(_.nonEmpty)
        .map(_.split(',').toSeq).getOrElse(Seq.empty)
      Some((schema, parts))
    }
  }
}

/** DSv2 `Table` over one TableLog snapshot (path + optional pinned
  * version/timestamp), shared by [[GraftSource]] and [[GraftCatalog]].
  */
private[sources] object GraftTable {
  import org.apache.spark.sql.{Column, functions => F}
  import org.apache.spark.sql.sources._

  /** Exact v1-Filter → Column translation for SQL DELETE; None for any
    * shape we cannot reproduce faithfully (the caller then REFUSES the
    * delete rather than approximating it).
    */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(F.col(a) === F.lit(v))
    case EqualNullSafe(a, v)      => Some(F.col(a) <=> F.lit(v))
    case GreaterThan(a, v)        => Some(F.col(a) > F.lit(v))
    case GreaterThanOrEqual(a, v) => Some(F.col(a) >= F.lit(v))
    case LessThan(a, v)           => Some(F.col(a) < F.lit(v))
    case LessThanOrEqual(a, v)    => Some(F.col(a) <= F.lit(v))
    case In(a, vs)                => Some(F.col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(F.col(a).isNull)
    case IsNotNull(a)             => Some(F.col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(F.col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(F.col(a).endsWith(v))
    case StringContains(a, v)     => Some(F.col(a).contains(v))
    case And(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
    case Not(c)                   => filterToColumn(c).map(!_)
    case _: AlwaysTrue            => Some(F.lit(true))
    case _: AlwaysFalse           => Some(F.lit(false))
    case _                        => None
  }
}

class GraftTable(spark: SparkSession, dir: String,
                 version: Option[Long], asOfTimestamp: Option[Long],
                 // path-based `readChangeFeed` reads surface the feed
                 // columns in the TABLE schema (catalog resolution takes
                 // Table.schema() before reader options exist, so the CDC
                 // door is the path provider — same split as Delta CDF)
                 cdcSchema: Boolean = false)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  private lazy val isEmpty = graft.core.TableLog.versions(spark, dir).isEmpty

  private lazy val sidecar = GraftTableSidecar.read(spark, dir)

  private lazy val (index, dataSchema, lines) =
    graft.core.TableLog.snapshotIndex(spark, dir, version, asOfTimestamp)

  /** The manifest lines of THIS table's pinned snapshot — what the
    * row-level write path must validate its positions against (see
    * [[graft.core.TableLog.deltaWriteSpec]]'s pinnedLines doc).
    */
  private[sources] def pinnedLines: Seq[String] =
    if (isEmpty) Seq.empty else lines

  // ALTER TABLE metadata of THIS snapshot (time travel pins the schema
  // that was current at the pinned version)
  private lazy val metaLogical: Option[StructType] =
    if (isEmpty) None else graft.core.TableLog.metaSchema(lines)
  private lazy val l2p: Map[String, String] =
    metaLogical.map(graft.core.TableLog.renameMap).getOrElse(Map.empty)
  // what the inner (file-facing) scans read: on-disk names; falls back
  // to the file-derived schema when no ALTER has ever run
  private lazy val physDataSchema: StructType =
    metaLogical.map(graft.core.TableLog.physicalSchema).getOrElse(dataSchema)

  private lazy val entries: Seq[(String, Long, Long)] = {
    // re-derive the entry list from the index's own inputFiles/listing —
    // snapshotIndex already priced the listing; reuse its file set
    index.listFiles(Seq.empty, Seq.empty).flatMap(_.files).map { f =>
      val rel = f.getPath.toUri.getPath
        .stripPrefix(new Path(dir).toUri.getPath).stripPrefix("/")
      (rel, f.getLen, f.getModificationTime)
    }
  }

  private def qualifiedDir: String = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(new Path(dir)).toUri.getPath
  }

  override def name(): String = s"graft.`$dir`" +
    version.map(v => s"@v$v").getOrElse("")

  // visible schema: data + hive partition columns, MINUS hidden-layout
  // directories (their pruning still runs in listFiles)
  override def schema(): StructType = {
    val base = baseSchema()
    if (cdcSchema) StructType(base.fields ++ GraftCdc.feedFields) else base
  }

  private def baseSchema(): StructType =
    if (isEmpty)
      sidecar.map(_._1).getOrElse(throw new IllegalStateException(
        s"table at $dir has no committed versions and no declared schema"))
    else {
      val hidden = graft.core.TableLog.layoutTransforms(lines).map(_.dirCol).toSet
      // LOGICAL data columns (mapping metadata stripped) + visible
      // hive partition columns
      val dataFields = metaLogical.map(ls => ls.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable)))
        .getOrElse(dataSchema.fields)
      StructType(dataFields ++
        index.partitionSchema.fields.filterNot(f => hidden.contains(f.name)))
    }

  // declared identity partitioning: the analyzer validates a static
  // `PARTITION (p=v)` spec against this (hidden-transform layout dirs
  // stay hidden, as in schema())
  override def partitioning(): Array[Transform] = {
    val cols =
      if (isEmpty) sidecar.map(_._2).getOrElse(Seq.empty)
      else {
        val hidden = graft.core.TableLog.layoutTransforms(lines).map(_.dirCol).toSet
        index.partitionSchema.fieldNames.toSeq.filterNot(hidden)
      }
    cols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(c)).toArray
  }

  // AUTOMATIC_SCHEMA_EVOLUTION opts into `MERGE ... WITH SCHEMA
  // EVOLUTION`: the analyzer (ResolveMergeIntoSchemaEvolution) diffs the
  // source schema against ours and routes the AddColumn changes through
  // [[GraftCatalog.alterTable]] — a METADATA-ONLY `#schema=` commit (old
  // files read null for the new column), composed with the ordinary
  // row-level delta write. Delta Lake's merge autoMerge role.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** SQL `DELETE FROM graft.s.n WHERE p` — merge-on-read by default
    * (deletion-vector sidecar, no data file touched; the same
    * [[graft.core.TableLog.deleteWhereDv]] the API exposes), or
    * copy-on-write under `spark.graft.delete.mode=cow`. Filters arrive
    * in LOGICAL names and resolve through the column mapping like every
    * other read. Predicate shapes we cannot translate exactly make
    * `canDeleteWhere` answer false (Spark then refuses the statement
    * instead of deleting the wrong rows).
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    !isEmpty && version.isEmpty && asOfTimestamp.isEmpty &&
      filters.forall(f => GraftTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(version.isEmpty && asOfTimestamp.isEmpty,
      s"cannot delete from a time-travel-pinned snapshot of $dir")
    val cond = filters.toSeq.map(f => GraftTable.filterToColumn(f).getOrElse(
      throw new UnsupportedOperationException(s"untranslatable filter $f")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    if (spark.conf.get("spark.graft.delete.mode", "mor") == "cow")
      graft.core.TableLog.deleteWhere(spark, dir, cond)
    else
      graft.core.TableLog.deleteWhereDv(spark, dir, cond)
  }

  // SHOW TBLPROPERTIES / DESCRIBE EXTENDED surface (`#tblprop=` metadata)
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("provider", "graft")
    if (!isEmpty)
      graft.core.TableLog.metaProps(lines).foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (options.getBoolean("readChangeFeed", false)) {
      require(version.isEmpty && asOfTimestamp.isEmpty,
        s"readChangeFeed cannot target a time-travel-pinned snapshot of $dir")
      val full =
        if (cdcSchema) schema()
        else StructType(baseSchema().fields ++ GraftCdc.feedFields)
      return new GraftCdcScanBuilder(spark, dir, full, options)
    }
    scanBuilder(options, forceWrapper = false) match {
      case (e: GraftEmptyScan, _) => e // nothing committed: nothing to stream
      case (b, pruneCtx) => new GraftStreamableScanBuilder(
        b.asInstanceOf[ScanBuilder
          with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
          with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters],
        spark, dir, options, pruneCtx)
    }
  }

  /** The row-level-operation read path: ALWAYS the
    * [[GraftMorScanBuilder]] wrapper so the `_file`/`_pos` row-ID
    * metadata columns resolve even on delete-free snapshots (the wrapper
    * still returns the stock vectorized scan when neither deletes nor
    * lineage are in play).
    */
  private[sources] def lineageScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    scanBuilder(options, forceWrapper = true) match {
      case (e: GraftEmptyScan, _) => e
      // same runtime-filtering wrapper as the read path: a MERGE/UPDATE
      // whose ON key is a partition column (or hidden-transform source)
      // gets its TARGET scan pruned by the source's join keys at
      // execution time — a daily MERGE into a 100 TB partitioned table
      // reads the touched partitions, not the table
      case (b, ctx) => new GraftStreamableScanBuilder(
        b.asInstanceOf[ScanBuilder
          with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
          with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters],
        spark, dir, options, ctx)
    }

  private def scanBuilder(options: CaseInsensitiveStringMap,
                          forceWrapper: Boolean)
      : (ScanBuilder, Option[GraftRuntimePruneCtx]) = {
    if (isEmpty) return (new GraftEmptyScan(schema()), None)
    val hasDeletes = graft.core.TableLog.dvFiles(lines).nonEmpty ||
      graft.core.TableLog.eqLines(lines).nonEmpty
    val snapIdx = new TableLogSnapshotIndex(spark, index, entries, dir)
    // inner scans run fully in ON-DISK (physical) names; the mapping
    // wrapper below translates at the plan boundary when any column was
    // renamed (rows are positional — zero per-row cost)
    val transforms = graft.core.TableLog.layoutTransforms(lines)
    val hidden = transforms.map(_.dirCol).toSet
    val physVisible = StructType(physDataSchema.fields ++
      index.partitionSchema.fields.filterNot(f => hidden.contains(f.name)))
    val innerBuilder: ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
        with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =
      if (!hasDeletes && !forceWrapper)
        ParquetScanBuilder(spark, snapIdx, physVisible, physDataSchema, options)
      else {
        // merge-on-read (and/or lineage): same pruning/pushdown, reader-
        // level subtraction; ONE cached broadcast per snapshot (dv
        // sidecar paths + eq key sets)
        val deletes = GraftMorScan.deletesFor(spark, dir, lines, physVisible)
        new GraftMorScanBuilder(spark, snapIdx, physVisible, physDataSchema,
          options, dir, qualifiedDir, deletes)
      }
    val pruneCtx = GraftRuntimePruneCtx(
      snapIdx,
      index.partitionSchema,
      index.partitionSchema.fieldNames.toSeq.filterNot(hidden),
      transforms.map(_.source),
      l2p, physDataSchema)
    (if (l2p.isEmpty) innerBuilder
     else new GraftMappedScanBuilder(innerBuilder, l2p),
     Some(pruneCtx))
  }

  /** Iceberg-named lineage metadata columns: `_file` (manifest-relative
    * path) and `_pos` (true parquet row index) — the row-level
    * operations' row ID, selectable in any MoR-path query.
    */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = GraftLineage.FileCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String = "manifest-relative data file path"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = GraftLineage.PosCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = false
        override def comment(): String = "row position within the data file"
      })

  /** SQL `UPDATE` / `MERGE INTO` / non-translatable `DELETE`: the
    * delta-based (merge-on-read) row-level operation —
    * [[GraftRowLevelOperation]].
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(version.isEmpty && asOfTimestamp.isEmpty,
      s"cannot run ${info.command} against a time-travel-pinned snapshot of $dir")
    () => new GraftRowLevelOperation(this, dir, info.command)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(version.isEmpty && asOfTimestamp.isEmpty,
      s"cannot write to a time-travel-pinned snapshot of $dir")
    new GraftWriteBuilder(spark, dir,
      sidecar.map(_._2).getOrElse(Seq.empty))
  }
}

/** Scan of a created-but-never-committed table: the declared schema,
  * zero partitions.
  */
private[sources] class GraftEmptyScan(s: StructType) extends ScanBuilder
  with org.apache.spark.sql.connector.read.Scan
  with org.apache.spark.sql.connector.read.Batch
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  // honor pruning verbatim — a row-level MERGE on a created-but-empty
  // table asks for the `_file`/`_pos` row-ID metadata columns, and zero
  // partitions satisfy any schema
  private var pruned: StructType = s
  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema
  override def build(): org.apache.spark.sql.connector.read.Scan = this
  override def readSchema(): StructType = pruned
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this
  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] =
    Array.empty
  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new org.apache.spark.sql.connector.read.PartitionReaderFactory {
      override def createReader(p: org.apache.spark.sql.connector.read.InputPartition) =
        throw new IllegalStateException("empty table has no partitions")
    }
}

/** SQL writes through the V1 fallback ([[V1Write]] → [[InsertableRelation]]):
  * the DataFrame lands in [[graft.core.TableLog.appendLikeTip]] /
  * `overwriteLikeTip`, so `INSERT INTO` pays exactly what the API path
  * pays — same atomic CAS commit, same optimistic rebase, same CHECK
  * constraints, same tip-matching layout (hive partitioning, hidden
  * transforms, stats columns, optimizeWrite).
  */
private[sources] class GraftWriteBuilder(spark: SparkSession, dir: String,
                                         declaredPartCols: Seq[String])
  extends WriteBuilder with SupportsOverwrite {

  private var overwriteAll = false
  // static-partition overwrite target: (partition col, hive path value)
  private var overwritePart: Seq[(String, String)] = Seq.empty

  /** `INSERT OVERWRITE` filter set: `AlwaysTrue` = full table; a
    * conjunction of partition-column equalities (the analyzer's encoding
    * of a static `PARTITION (p=v)` spec) = partition-scoped — routed to
    * [[graft.core.TableLog.overwritePartitions]]'s file-selective
    * rewrite, the reference's partitioned fact backfill
    * (/root/reference/src/gold/facts/fact_adverse_events.py:325-327).
    * Values render through Spark's own hive path escaping so the
    * manifest's path-segment match sees exactly what the writer laid
    * out.
    */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[AlwaysTrue])) { overwriteAll = true; return this }
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    overwritePart = filters.toSeq.map {
      case org.apache.spark.sql.sources.EqualTo(c, v) if v != null =>
        c -> ExternalCatalogUtils.escapePathName(String.valueOf(v))
      case org.apache.spark.sql.sources.EqualNullSafe(c, v) if v != null =>
        c -> ExternalCatalogUtils.escapePathName(String.valueOf(v))
      case f => throw new IllegalArgumentException(
        s"graft: INSERT OVERWRITE supports the full table or a static " +
          s"non-null partition-equality spec; got $f — use " +
          "TableLog.deleteWhere + append for predicate overwrites")
    }
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
                            overwrite: Boolean): Unit =
          if (overwritePart.nonEmpty)
            graft.core.TableLog.overwritePartitions(spark, dir, data,
              overwritePart)
          else if (overwriteAll || overwrite)
            graft.core.TableLog.overwriteLikeTip(spark, dir, data,
              declaredPartCols)
          else
            graft.core.TableLog.appendLikeTip(spark, dir, data,
              declaredPartCols)
      }
  }
}

/** `spark.read.format("graft").load(dir)` — short name via
  * META-INF/services. Options: `versionAsOf` (long), `timestampAsOf`
  * (epoch millis).
  */
class GraftSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft"

  private def tableFor(options: CaseInsensitiveStringMap): GraftTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft: missing path (use .load(dir))"))
    new GraftTable(SparkSession.active, path,
      Option(options.get("versionAsOf")).map(_.toLong),
      Option(options.get("timestampAsOf")).map(_.toLong),
      cdcSchema = options.getBoolean("readChangeFeed", false))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableFor(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    tableFor(new CaseInsensitiveStringMap(properties))
}

/** `TableCatalog` plugin: identifier `graft.<schema>.<name>` maps to the
  * directory `<warehouse>/<schema>/<name>`. Reads AND writes resolve
  * here — `CREATE TABLE` / CTAS / `INSERT` / `DROP TABLE` all commit
  * through the TableLog protocol. `alterTable`/`renameTable` remain
  * unsupported (schema evolves additively through appends, as on the
  * API path).
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name: set spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString(warehouse + "/", "/", "")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val spark = SparkSession.active
    val base = new Path((warehouse +: namespace).mkString("/"))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base).filter(_.isDirectory)
      .filter(st => fs.exists(new Path(st.getPath, "_graft_log")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None, None)

  // SQL `VERSION AS OF <v>` lands here with the version as a string
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(version.toLong), None)

  // SQL `TIMESTAMP AS OF <ts>` lands here with epoch MICROseconds
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadAt(ident, None, Some(timestamp / 1000L))

  private def loadAt(ident: Identifier, v: Option[Long],
                     tsMillis: Option[Long]): Table = {
    val spark = SparkSession.active
    val dir = dirOf(ident)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_graft_log")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new GraftTable(spark, dir, v, tsMillis)
  }

  override def tableExists(ident: Identifier): Boolean = {
    val spark = SparkSession.active
    val p = new Path(dirOf(ident), "_graft_log")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** `CREATE TABLE graft.s.n (...)` / the createTable half of CTAS and
    * `saveAsTable`: persists the declared schema + identity partition
    * columns as a sidecar; the first insert commits version 1 with that
    * layout. Only identity partitioning is expressible in SQL — hidden-
    * partitioning transforms are declared on the first API append
    * (`TableLog.append(transforms = ...)`) and honored by every later
    * SQL write via the tip's `#layout=` lines.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"graft: only identity PARTITIONED BY columns via SQL (got $t); " +
          "declare transforms on the first TableLog.append")
      t.references()(0).fieldNames().mkString(".")
    }
    val spark = SparkSession.active
    GraftTableSidecar.write(spark, dirOf(ident), schema, partCols)
    new GraftTable(spark, dirOf(ident), None, None)
  }

  /** `ALTER TABLE` — ADD/RENAME/DROP COLUMN and SET/UNSET TBLPROPERTIES
    * as METADATA-ONLY commits on the TableLog (`#schema=` / `#tblprop=`
    * manifest lines): no data file is read or rewritten, renames ride a
    * Delta-style column mapping (`graft.physical` field metadata), and
    * time travel to an earlier version sees the earlier schema. On a
    * created-but-never-written table the declared sidecar is rewritten
    * instead (nothing committed yet to alter).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val spark = SparkSession.active
    val dir = dirOf(ident)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    import org.apache.spark.sql.types.{StructField, StructType => ST}
    val colChanges = changes.collect {
      case c: TableChange.AddColumn        => c
      case c: TableChange.RenameColumn     => c
      case c: TableChange.DeleteColumn     => c
      case c: TableChange.UpdateColumnType => c
    }
    val setProps = changes.collect {
      case p: TableChange.SetProperty => p.property -> p.value }.toMap
    val unsetProps = changes.collect {
      case p: TableChange.RemoveProperty => p.property }
    val unsupported = changes.filterNot(c =>
      colChanges.contains(c) ||
        c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty])
    if (unsupported.nonEmpty)
      throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change(s) " +
          s"${unsupported.map(_.getClass.getSimpleName).mkString(", ")}")

    def one(names: Array[String], what: String): String = {
      require(names.length == 1,
        s"graft catalog: nested-column $what is unsupported " +
          s"(got ${names.mkString(".")})")
      names(0)
    }
    // physical column names files already carry (including DROPped
    // ones): a re-added logical name gets a FRESH on-disk name so old
    // data can never resurrect under it (Delta column-mapping rule)
    def applyChanges(cur: ST, filePhys: Set[String]): ST =
      colChanges.foldLeft(cur) { (s, ch) => ch match {
        case a: TableChange.AddColumn =>
          val n = one(a.fieldNames, "ADD")
          require(!s.fieldNames.contains(n), s"column $n already exists")
          val taken = filePhys ++ s.fields.map(graft.core.TableLog.physName)
          val f0 = StructField(n, a.dataType, a.isNullable)
          val f =
            if (!taken.contains(n)) f0
            else f0.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .putString(graft.core.TableLog.PhysKey,
                s"${n}_${java.util.UUID.randomUUID().toString.take(8)}")
              .build())
          ST(s.fields :+ f)
        case r: TableChange.RenameColumn =>
          val n = one(r.fieldNames, "RENAME")
          val i = s.fieldIndex(n)
          val old = s.fields(i)
          val phys = graft.core.TableLog.physName(old)
          val f =
            if (phys == r.newName) // renamed back to its on-disk name
              old.copy(name = r.newName,
                metadata = org.apache.spark.sql.types.Metadata.empty)
            else old.copy(name = r.newName,
              metadata = new org.apache.spark.sql.types.MetadataBuilder()
                .putString(graft.core.TableLog.PhysKey, phys).build())
          ST(s.fields.updated(i, f))
        case d: TableChange.DeleteColumn =>
          val n = one(d.fieldNames, "DROP")
          if (!s.fieldNames.contains(n)) {
            require(d.ifExists, s"column $n does not exist"); s
          } else ST(s.fields.filterNot(_.name == n))
        case u: TableChange.UpdateColumnType =>
          // widening-only; TableLog.alterSchema validates isSafeWidening
          // against the committed schema and refuses anything lossy
          val n = one(u.fieldNames, "ALTER TYPE")
          val i = s.fieldIndex(n)
          ST(s.fields.updated(i, s.fields(i).copy(dataType = u.newDataType())))
      } }

    val vs = graft.core.TableLog.versions(spark, dir)
    if (colChanges.nonEmpty) {
      if (vs.isEmpty) {
        // declared-only table: rewrite the sidecar (no mapping needed —
        // no file exists to map against)
        val (cur, parts) = GraftTableSidecar.read(spark, dir).getOrElse(
          throw new IllegalStateException(s"no declared schema under $dir"))
        val touched = colChanges.flatMap {
          case r: TableChange.RenameColumn => Seq(one(r.fieldNames, "RENAME"))
          case d: TableChange.DeleteColumn => Seq(one(d.fieldNames, "DROP"))
          case _ => Seq.empty
        }
        touched.foreach(c => require(!parts.contains(c),
          s"column $c is a partition column and cannot be renamed or dropped"))
        GraftTableSidecar.write(spark, dir,
          applyChanges(cur, Set.empty), parts)
      } else {
        val filePhys = graft.core.TableLog
          .snapshotIndex(spark, dir, None, None)._2.fieldNames.toSet
        graft.core.TableLog.alterSchema(spark, dir)(cur =>
          applyChanges(cur, filePhys))
      }
    }
    if (setProps.nonEmpty || unsetProps.nonEmpty) {
      require(vs.nonEmpty, "graft catalog: SET/UNSET TBLPROPERTIES needs " +
        "a committed version (insert first)")
      graft.core.TableLog.setTableProperties(spark, dir, setProps, unsetProps)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val spark = SparkSession.active
    val dir = new Path(dirOf(ident))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_graft_log"))) false
    else fs.delete(dir, true)
  }

  /** `ALTER TABLE ... RENAME TO` — one filesystem rename of the table
    * directory (log, data, sidecars move together; on HDFS a namenode
    * metadata op, on object stores the same caveat as every
    * rename-based system). The commit log itself is untouched: history,
    * time travel, and properties all survive under the new name.
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val spark = SparkSession.active
    if (!tableExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(newIdent)
    val from = new Path(dirOf(oldIdent))
    val to = new Path(dirOf(newIdent))
    val fs = from.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(to.getParent)
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"rename $from -> $to failed")
  }
}
