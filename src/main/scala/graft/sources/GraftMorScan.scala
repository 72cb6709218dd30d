package graft.sources

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportStatistics,
  Statistics}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Merge-on-read through the DSv2 front door: the scan-level twin of the
  * anti-joins `TableLog.table` composes (reference surface:
  * `spark.table(...)` everywhere, /root/reference/src/utils/
  * silver_transformations.py:43 — a user must not lose SQL access to a
  * table the moment someone runs a GDPR delete on it).
  *
  * Positional deletion vectors need each row's parquet row index; Spark's
  * own `_metadata.row_index` machinery bottoms out in a reader-generated
  * column keyed by the reserved name
  * [[ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME]] — split-safe and
  * pushdown-safe (the generator walks row-group offsets, so indexes stay
  * TRUE file positions even when predicate pushdown skips rows). We append
  * that field to the inner [[ParquetScanBuilder]]'s data schema, let the
  * stock scan do EVERYTHING it does today (manifest-backed pruning,
  * min/max skipping, filter pushdown, column pruning), and wrap its
  * readers to drop rows whose (file, row-index) sits in a deletion vector
  * or whose key tuple sits in an equality-delete set.
  *
  * Row-group/filter pushdown stays ON: a pushed filter only removes rows
  * the query's own Filter node would re-reject — hidden (deleted) rows
  * are *subtracted*, so early removal can never change the result, and
  * the row-index generator keeps absolute positions regardless.
  * Aggregate pushdown is deliberately NOT offered (a pushed count would
  * see deleted rows).
  *
  * SCALE: delete sidecars are deleted-row-count sized by design (that is
  * why dv/eq deletes exist — kilobytes of sidecar against a 100 TB
  * table); they are loaded once on the driver, capped by
  * `spark.graft.catalog.morMaxEntries` (default 10M — past that the
  * table needs OPTIMIZE, and the error says so), and shipped to
  * executors as ONE broadcast, not per-task closures. The read-side cost
  * is a row-based (non-vectorized) reader on MoR snapshots only —
  * compaction retires the vectors and restores the vectorized fast path,
  * the same trade Delta/Iceberg make.
  */
object GraftMorScan {

  /** (file -> sorted deleted row indexes, eq-delete groups as (key
    * ordinal schema types, key tuple set)). Loaded driver-side from the
    * snapshot's sidecars; values are CATALYST values (UTF8String etc.) so
    * executors compare without conversion.
    */
  private[sources] def loadDeletes(spark: SparkSession, dir: String,
                                   lines: Seq[String])
      : (Map[String, Array[Long]], Seq[(Seq[String], Set[Seq[Any]])]) = {
    val cap = spark.conf
      .get("spark.graft.catalog.morMaxEntries", "10000000").toLong
    val dvs = graft.core.TableLog.dvFiles(lines)
    val dvMap: Map[String, Array[Long]] =
      if (dvs.isEmpty) Map.empty
      else {
        val df = spark.read.parquet(dvs.map(f => s"$dir/$f"): _*)
        val n = df.count()
        require(n <= cap, s"snapshot at $dir carries $n deletion-vector " +
          s"entries (> spark.graft.catalog.morMaxEntries=$cap); run " +
          "OPTIMIZE (TableLog.compact) to materialize the deletes first")
        df.select("_dv_file", "_dv_idx").collect()
          .groupBy(_.getString(0))
          .map { case (f, rows) =>
            f -> rows.map(_.getLong(1)).distinct.sorted
          }
      }
    val eqGroups = graft.core.TableLog.eqLines(lines).groupBy(_._2).toSeq
    val eqSets = eqGroups.map { case (cols, entries) =>
      val df = spark.read.parquet(entries.map(e => s"$dir/${e._1}"): _*)
        .select(cols.map(org.apache.spark.sql.functions.col): _*)
      val n = df.count()
      require(n <= cap, s"snapshot at $dir carries $n equality-delete " +
        s"keys (> spark.graft.catalog.morMaxEntries=$cap); run " +
        "OPTIMIZE (TableLog.compact) to materialize the deletes first")
      val converters = df.schema.fields.map(f =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToCatalystConverter(f.dataType))
      val keys = df.collect().map { r =>
        Seq.tabulate(converters.length)(i =>
          if (r.isNullAt(i)) null else converters(i)(r.get(i)))
      }.toSet
      (cols, keys)
    }
    (dvMap, eqSets)
  }
}

/** Delegates pruning + catalyst filter pushdown to a stock
  * [[ParquetScanBuilder]] whose data schema is augmented with the
  * reader-generated row-index column (dv snapshots) and any
  * equality-delete key columns the query pruned away.
  */
class GraftMorScanBuilder(spark: SparkSession,
                          index: PartitioningAwareFileIndex,
                          tableSchema: StructType, dataSchema: StructType,
                          options: CaseInsensitiveStringMap,
                          dir: String, qualifiedDir: String,
                          dv: Map[String, Array[Long]],
                          eq: Seq[(Seq[String], Set[Seq[Any]])])
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownCatalystFilters {

  private val rowIdxName = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
  private val needRowIdx = dv.nonEmpty

  private val augDataSchema =
    if (needRowIdx)
      StructType(dataSchema.fields :+ StructField(rowIdxName, LongType, nullable = true))
    else dataSchema

  private val inner = ParquetScanBuilder(spark, index,
    StructType(tableSchema.fields ++
      (if (needRowIdx) Seq(StructField(rowIdxName, LongType, nullable = true))
       else Seq.empty)),
    augDataSchema, options)

  // what the QUERY asked for — extras are appended below, then projected
  // back out by the reader
  private var visible: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    visible = requiredSchema

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)

  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  override def build(): Scan = {
    val visNames = visible.fieldNames.toSet
    val eqKeyCols = eq.flatMap(_._1).distinct
    val extraKeys = eqKeyCols.filterNot(visNames)
      .flatMap(c => tableSchema.fields.find(_.name == c))
    val required = StructType(visible.fields ++ extraKeys ++
      (if (needRowIdx) Seq(StructField(rowIdxName, LongType, nullable = true))
       else Seq.empty))
    inner.pruneColumns(required)
    val pScan = inner.build().asInstanceOf[ParquetScan]
    // the inner row layout the readers actually produce: data cols (in
    // augmented-dataSchema order) then partition cols
    val innerRow = StructType(
      pScan.readDataSchema.fields ++ pScan.readPartitionSchema.fields)
    val declared = StructType(visible.fieldNames.flatMap(n =>
      innerRow.fields.find(_.name == n)))
    val outOrdinals = declared.fieldNames.map(n => innerRow.fieldNames.indexOf(n))
    val rowIdxOrd = innerRow.fieldNames.indexOf(rowIdxName)
    val eqBound = eq.map { case (cols, keys) =>
      (cols.map(c => innerRow.fieldNames.indexOf(c)).toArray,
        cols.map(c => innerRow.fields(innerRow.fieldNames.indexOf(c)).dataType).toArray,
        keys)
    }
    new GraftMorScanImpl(spark, pScan, declared, innerRow,
      outOrdinals, rowIdxOrd, qualifiedDir,
      spark.sparkContext.broadcast((dv, eqBound)))
  }
}

private[sources] class GraftMorScanImpl(
    spark: SparkSession, inner: ParquetScan, declared: StructType,
    innerRow: StructType, outOrdinals: Array[Int], rowIdxOrd: Int,
    qualifiedDir: String,
    deletes: Broadcast[(Map[String, Array[Long]],
      Seq[(Array[Int], Array[DataType], Set[Seq[Any]])])])
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = declared

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftMorScan(${inner.description()})"

  // conservative overestimate: file bytes include deleted rows — fine for
  // join-side planning, and exact stats would need a count
  override def estimateStatistics(): Statistics = inner.estimateStatistics()

  /** One PartitionedFile per InputPartition so each reader knows its
    * file's deletion vector. Splits survive (a split PartitionedFile
    * still names its file; row-index generation is split-correct).
    */
  override def planInputPartitions(): Array[InputPartition] =
    inner.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files.map(f => f)
      case other => throw new IllegalStateException(
        s"unexpected non-file partition from parquet scan: $other")
    }.zipWithIndex.map { case (f, i) => FilePartition(i, Array(f)) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMorReaderFactory(inner.createReaderFactory(), innerRow,
      outOrdinals, rowIdxOrd, qualifiedDir, deletes)
}

/** Row-based reader wrapper: delegates to the stock parquet reader, drops
  * dv/eq-deleted rows, projects the internal extras (row index, re-added
  * key columns) back out.
  */
private[sources] class GraftMorReaderFactory(
    inner: PartitionReaderFactory, innerRow: StructType,
    outOrdinals: Array[Int], rowIdxOrd: Int, qualifiedDir: String,
    deletes: Broadcast[(Map[String, Array[Long]],
      Seq[(Array[Int], Array[DataType], Set[Seq[Any]])])])
  extends PartitionReaderFactory {

  // MoR snapshots read row-based: per-row subtraction can't run on a
  // ColumnarBatch without a selection-vector protocol Spark doesn't
  // expose. Compaction retires the vectors and the vectorized path.
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val fp = partition.asInstanceOf[FilePartition]
    require(fp.files.length == 1, "GraftMorScan plans one file per partition")
    val rel = fp.files.head.toPath.toUri.getPath
      .stripPrefix(qualifiedDir).stripPrefix("/")
    val (dvMap, eqSets) = deletes.value
    val deleted: Array[Long] = dvMap.getOrElse(rel, Array.emptyLongArray)
    val delegate = inner.createReader(partition)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      private lazy val proj = UnsafeProjection.create(
        outOrdinals.map(i => BoundReference(i,
          innerRow.fields(i).dataType, innerRow.fields(i).nullable)
          : Expression).toIndexedSeq)

      private def survives(r: InternalRow): Boolean = {
        if (deleted.nonEmpty && rowIdxOrd >= 0 &&
          java.util.Arrays.binarySearch(deleted, r.getLong(rowIdxOrd)) >= 0)
          return false
        var i = 0
        while (i < eqSets.length) {
          val (ords, types, keys) = eqSets(i)
          val tuple = Seq.tabulate(ords.length)(j =>
            if (r.isNullAt(ords(j))) null else r.get(ords(j), types(j)))
          if (keys.contains(tuple)) return false
          i += 1
        }
        true
      }

      override def next(): Boolean = {
        while (delegate.next()) {
          val r = delegate.get()
          if (survives(r)) { cur = r; return true }
        }
        false
      }

      override def get(): InternalRow = proj(cur)

      override def close(): Unit = delegate.close()
    }
  }
}
