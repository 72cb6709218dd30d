package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** A minimal manifest-log table format over plain parquet — the engine's
  * stand-in for the Delta transaction log the reference leans on
  * (`bronze.write.format("delta")`, MERGE, OPTIMIZE; no Delta/Iceberg jars
  * exist in this environment, SURVEY §7.1).
  *
  * Layout: data files live flat in the table directory; `_graft_log/`
  * holds one log file per version — a full-snapshot CHECKPOINT manifest
  * (`<v>.manifest`, zero-padded) listing the COMPLETE set of data files
  * (+ state metadata) of that snapshot, or a DELTA (`<v>.delta`) holding
  * only that commit's line edits (`+added` / `-removed`) against its
  * predecessor. Version 1 and every k-th version checkpoint
  * (`spark.graft.tablelog.checkpointInterval`, default 10; 1 restores
  * the all-manifests format, which old tables on disk already have —
  * both kinds interoperate in one log). Readers resolve a delta version
  * by replaying at most k−1 deltas forward from the nearest checkpoint
  * (amortized O(1) via a per-table snapshot cache keyed on the immutable
  * log file's identity), so commit cost is O(changed lines) instead of
  * O(files) — at a million files and thousands of commits, the
  * difference between a metadata layer that scales and one that writes
  * the full file listing every commit (Delta's checkpoint-plus-JSON-
  * actions protocol, re-derived over plain text manifests).
  *
  * Guarantees, and how:
  *  - **Atomic commit**: data files are fully written (staged under a
  *    dot-prefixed dir, then moved in with a unique commit prefix) BEFORE
  *    the manifest exists; the manifest is created with an atomic
  *    create-no-overwrite, so a version either exists completely or not at
  *    all. A crash mid-write leaves orphan data files that no manifest
  *    references — invisible to readers, reclaimed by [[vacuum]].
  *  - **Optimistic concurrency**: two writers racing to version N+1 — one
  *    wins the create-no-overwrite, the loser re-reads the new tip and
  *    retries (classic lakehouse-log protocol).
  *  - **Snapshot isolation**: a reader resolves its manifest once; later
  *    commits add files under NEW names (commit-prefixed), and compaction
  *    never deletes data files — only [[vacuum]] does, and only for
  *    versions older than the retention floor.
  *  - **Time travel**: `read(version = Some(v))` pins any retained
  *    manifest ([[graft.ops.SnapshotDiff]] turns two versions into a CDC
  *    change feed).
  *  - **Exactly-once streaming ingest**: [[appendIdempotent]] records a
  *    transaction token per commit and skips re-delivered batches —
  *    `foreachBatch` + batchId gives end-to-end exactly-once appends.
  *  - **Partitioned tables**: `partitionBy` lays commits out hive-style
  *    (`col=val/...`); [[read]] re-derives partition columns via basePath
  *    and prunes files by path at the MANIFEST level — a pure metadata
  *    operation, before Spark lists or opens anything.
  *  - **Copy-on-write DELETE / MERGE**: [[deleteWhere]] and [[upsert]]
  *    rewrite only the data files containing affected rows; everything
  *    else carries into the new version untouched.
  *  - **Merge-on-read DELETE (deletion vectors)**: [[deleteWhereDv]]
  *    records (file, row-index) sidecars under `_graft_dv/` and touches
  *    NO data file; [[read]] hides the rows via an anti-join on parquet
  *    `_metadata.row_index`, rewrite paths read through the vectors (no
  *    resurrection), [[compact]] materializes and retires them, and
  *    [[vacuum]] reclaims unreferenced sidecars.
  *  - **Data skipping**: `append(statsCol=...)` records per-file min/max
  *    in the manifest (`#stats=` lines, carried forward with their
  *    files); `read(skip=(col,lo,hi))` drops files whose range cannot
  *    match — no footer reads, no file listing, just the log.
  *  - **OPTIMIZE**: [[compact]] rewrites the current snapshot into
  *    target-size files and commits a new manifest; old versions still
  *    reference the old files, so layout changes are themselves
  *    time-travelable.
  *  - **RESTORE / HISTORY**: [[restore]] rolls back to any retained
  *    version with a metadata-only commit (no data moves); every commit
  *    records its operation as `#op=` metadata, surfaced by [[history]]
  *    as the `DESCRIBE HISTORY` audit trail.
  */
object TableLog {

  private val LogDir = "_graft_log"
  private val DvDir = "_graft_dv"

  /** Materialized change-data sidecars (the Delta `_change_data` role):
    * `_change_data/_commit_version=<v>/part-*.parquet` + `_SUCCESS`,
    * written at commit time when the table opts in (see [[CdfProp]]).
    * Hive-partitioned by version on purpose: one basePath scan over MANY
    * materialized commits re-derives `_commit_version` as a partition
    * column, so a rewrite-heavy [[changes]] window plans as one scan per
    * schema era instead of one reconstruction branch per commit.
    */
  private[graft] val ChangeDataDir = "_change_data"

  /** Table property opting into change-data materialization (Delta's
    * `delta.enableChangeDataFeed`): every data-changing non-insert commit
    * writes its typed change rows as a [[ChangeDataDir]] sidecar.
    */
  private[graft] val CdfProp = "graft.enableChangeDataFeed"

  /** Comma-separated business key used for the materialized feed's
    * update/insert/delete classification and no-op suppression (see
    * [[changes]]). A [[changes]] call requesting a DIFFERENT key falls
    * back to per-commit reconstruction — the sidecar's classification is
    * key-dependent and must not be served under another key.
    */
  private[graft] val CdfKeysProp = "graft.changeDataFeed.keys"

  private[graft] def cdfEnabled(props: Map[String, String]): Boolean =
    props.get(CdfProp).exists(_.trim.equalsIgnoreCase("true"))

  private[graft] def cdfKeys(props: Map[String, String]): Seq[String] =
    props.get(CdfKeysProp).toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long) =
    new Path(new Path(dir, LogDir), f"$v%020d.manifest")

  private def deltaPath(dir: String, v: Long) =
    new Path(new Path(dir, LogDir), f"$v%020d.delta")

  /** The log file recording version `v`: the full checkpoint manifest if
    * one exists, else the delta. (Both can exist for one version after
    * [[vacuum]] materializes a checkpoint over a delta; the manifest wins
    * and the contents are equivalent by construction.)
    */
  private def logFileOf(fs: org.apache.hadoop.fs.FileSystem,
                        dir: String, v: Long): Path = {
    val m = manifestPath(dir, v)
    if (fs.exists(m)) m else deltaPath(dir, v)
  }

  /** Commits between full-snapshot checkpoint manifests. Intermediate
    * commits write `.delta` files holding only the commit's own line
    * edits (`+added` / `-removed`), so a commit to an F-file table costs
    * O(changed) log bytes instead of O(F) — the difference between
    * O(V·F) and O(V·changed + V·F/K) total log bytes over a table's
    * lifetime, which is what keeps a million-file, thousand-commit table's
    * metadata affordable. 1 = every commit is a full manifest (the
    * pre-checkpoint format; old tables on disk read unchanged, and the
    * two kinds interoperate freely within one log).
    */
  private def checkpointInterval(spark: SparkSession): Int =
    math.max(1,
      spark.conf.get("spark.graft.tablelog.checkpointInterval", "10").toInt)

  /** Per-VERSION metadata lines — recorded by exactly one commit, never
    * carried forward into later snapshots (everything else in a manifest
    * is snapshot STATE: data files, #stats, #dvp/#dveq, #layout, #check).
    */
  private def isPerVersion(l: String): Boolean =
    l.startsWith("#op=") || l.startsWith("#txn=")

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val log = new Path(dir, LogDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".manifest") || n.endsWith(".delta"))
      .map(_.stripSuffix(".manifest").stripSuffix(".delta").toLong)
      .distinct
      .sorted
  }

  private def rawLines(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Resolver cache: qualified dir -> (version, that version's log-file
    * (mtime, length), resolved snapshot-state lines). Log files are
    * immutable after their atomic create, so a cached snapshot can only go
    * stale if the table is deleted and recreated at the same path — the
    * (mtime, length) identity check catches that (the recreated table's
    * log file at the cached version is a different file; length breaks the
    * tie when a fast recreation lands on the same coarse-granularity
    * millisecond). The key is the FileSystem-qualified path so equivalent
    * spellings of one dir share an entry. One entry per table: tip
    * resolution (every commit, every read) is the hot path; historical
    * resolutions walk back to the nearest checkpoint instead.
    */
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, (Long, Long), Seq[String])]()

  private def cacheKey(fs: org.apache.hadoop.fs.FileSystem, dir: String): String =
    fs.makeQualified(new Path(dir)).toString

  private def logFileId(fs: org.apache.hadoop.fs.FileSystem, p: Path): (Long, Long) = {
    val st = fs.getFileStatus(p)
    (st.getModificationTime, st.getLen)
  }

  private def cachedSnapshot(fs: org.apache.hadoop.fs.FileSystem,
                             dir: String, v: Long): Option[Seq[String]] =
    Option(snapCache.get(cacheKey(fs, dir))).filter(_._1 == v).flatMap {
      case (_, id, snap) =>
        val ok =
          try {
            val m = manifestPath(dir, v)
            val d = deltaPath(dir, v)
            (fs.exists(m) && logFileId(fs, m) == id) ||
              (fs.exists(d) && logFileId(fs, d) == id)
          } catch { case _: java.io.IOException => false }
        if (ok) Some(snap) else None
    }

  private def cacheSnapshot(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                            v: Long, logPath: Path,
                            snapshot: Seq[String]): Unit =
    try {
      snapCache.merge(cacheKey(fs, dir), (v, logFileId(fs, logPath), snapshot),
        (old, nw) => if (nw._1 >= old._1) nw else old)
    } catch { case _: java.io.IOException => () }

  /** The version's full-snapshot-equivalent manifest lines: snapshot
    * state (data files + `#`-state metadata) plus the version's own
    * per-version lines (`#op=`, `#txn=`) — exactly what a full manifest
    * contains. A checkpoint manifest is returned verbatim; a delta
    * version is resolved by walking back to the nearest checkpoint (or
    * the cached snapshot) and replaying each delta's `-removed`/`+added`
    * line edits in commit order.
    */
  private[graft] def manifestLines(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    val fs = fsOf(spark, dir)
    val full = manifestPath(dir, v)
    if (fs.exists(full)) {
      val lines = rawLines(fs, full)
      cacheSnapshot(fs, dir, v, full, lines.filterNot(isPerVersion))
      return lines
    }
    val ownPath = deltaPath(dir, v)
    if (!fs.exists(ownPath)) throw new java.io.FileNotFoundException(
      s"version $v of $dir has no log file (vacuumed?)")
    // hot path: the requested version itself is cached (tip resolution —
    // the commit-time seed serves the NEXT commit/read here); only the
    // version's own small delta is re-read, for its per-version lines
    cachedSnapshot(fs, dir, v).foreach { snap =>
      return snap ++ rawLines(fs, ownPath).filter(isPerVersion)
    }
    // newest-first stack of deltas between v and the resolution base
    val deltas = scala.collection.mutable.ArrayBuffer(rawLines(fs, ownPath))
    var cur = v - 1
    var base: Seq[String] = null
    while (base == null && cur > 0) {
      cachedSnapshot(fs, dir, cur) match {
        case Some(s) => base = s
        case None =>
          val m = manifestPath(dir, cur)
          if (fs.exists(m)) base = rawLines(fs, m).filterNot(isPerVersion)
          else {
            val d = deltaPath(dir, cur)
            if (!fs.exists(d)) throw new java.io.FileNotFoundException(
              s"version $v of $dir unresolvable: log file for intermediate " +
                s"version $cur missing (vacuumed?)")
            deltas += rawLines(fs, d)
            cur -= 1
          }
      }
    }
    val state = scala.collection.mutable.LinkedHashSet(
      (if (base == null) Seq.empty[String] else base): _*)
    deltas.reverseIterator.foreach { d => // oldest -> newest
      d.foreach { l =>
        if (l.startsWith("-")) state -= l.drop(1)
        else if (l.startsWith("+")) state += l.drop(1)
        // bare lines are the delta's per-version metadata — not state
      }
    }
    val snapshot = state.toSeq
    cacheSnapshot(fs, dir, v, ownPath, snapshot)
    snapshot ++ deltas.head.filter(isPerVersion)
  }

  /** Only version `v`'s OWN per-version metadata (`#op=`, `#txn=`) — read
    * from the single log file, never resolving the snapshot, so token and
    * history scans stay one small file read per version in both formats.
    */
  private def versionMeta(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    val fs = fsOf(spark, dir)
    rawLines(fs, logFileOf(fs, dir, v)).filter(isPerVersion)
  }

  private def readManifest(spark: SparkSession, dir: String, v: Long): Seq[String] =
    manifestLines(spark, dir, v).filterNot(_.startsWith("#"))

  /** Parse `#stats=<file>|<col>|<min>|<max>` metadata into a per-file,
    * per-COLUMN map (one manifest line per file×column — multi-column
    * skipping, the Delta default for its leading columns). Manifests are
    * self-contained: every commit re-emits the stats of each file it
    * lists, so the TIP manifest alone answers skipping.
    */
  private[core] def fileStats(lines: Seq[String])
      : Map[String, Map[String, (Long, Long)]] =
    lines.filter(_.startsWith("#stats=")).flatMap {
      _.stripPrefix("#stats=").split('|') match {
        case Array(f, c, mn, mx) => Some((f, c, mn.toLong, mx.toLong))
        case _ => None
      }
    }.groupBy(_._1)
      .map { case (f, es) =>
        f -> es.map { case (_, c, mn, mx) => c -> ((mn, mx)) }.toMap
      }

  private def statsLines(f: String, m: Map[String, (Long, Long)]): Seq[String] =
    m.toSeq.sortBy(_._1).map { case (c, (mn, mx)) => s"#stats=$f|$c|$mn|$mx" }

  /** `#dvp=<relpath>` manifest metadata: deletion-vector sidecar files
    * (parquet of `_dv_file` STRING, `_dv_idx` LONG — manifest-relative
    * data-file path + parquet row index). A snapshot's visible rows are
    * its data files MINUS the union of its dv entries; entries whose data
    * file left the snapshot (rewritten/compacted away) are inert.
    */
  // BOTH delete families ride the same carry/clear lifecycle (dvp =
  // positional vectors, dveq = equality deletes)
  private def dvLines(lines: Seq[String]): Seq[String] =
    lines.filter(l => l.startsWith("#dvp=") || l.startsWith("#dveq="))

  private[graft] def dvFiles(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith("#dvp=")).map(_.stripPrefix("#dvp="))

  /** `#layout=` lines parsed into hidden-partitioning transforms. */
  private[graft] def layoutTransforms(lines: Seq[String]): Seq[graft.sources.PartTransform] =
    lines.filter(_.startsWith("#layout="))
      .flatMap(l => graft.sources.PartTransform.parse(l.stripPrefix("#layout=")))

  // ------------------------------------------------------------------
  // ALTER TABLE metadata — Delta-style schema-as-metadata + column
  // mapping. A `#schema=<StructType json>` manifest line (latest wins,
  // carried forward by every commit) is the table's LOGICAL data schema
  // once any ALTER has run; before that the schema stays file-derived
  // exactly as today. RENAME COLUMN never touches a data file: the
  // renamed field carries its on-disk name in field metadata
  // (`graft.physical`), reads project physical->logical, writes rename
  // logical->physical at the single [[writeDataFiles]] funnel. DROP
  // COLUMN is metadata-only (the physical column stays in files,
  // invisible); ADD COLUMN surfaces as nulls until data arrives
  // (mergeSchema semantics). Reference surface: the lakehouse's schema
  // DDL (/root/reference/README.md table management); design follows the
  // public Delta column-mapping / Iceberg field-id approach re-expressed
  // on parquet field names.
  // ------------------------------------------------------------------

  private[graft] val PhysKey = "graft.physical"

  /** Latest `#schema=` line, parsed: the logical DATA schema (hive
    * partition columns are never in it — they are path-derived and not
    * alterable).
    */
  private[graft] def metaSchema(lines: Seq[String])
      : Option[org.apache.spark.sql.types.StructType] =
    lines.filter(_.startsWith("#schema=")).lastOption.map(l =>
      org.apache.spark.sql.types.DataType.fromJson(l.stripPrefix("#schema="))
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** On-disk (parquet) name of a logical field — differs only after a
    * RENAME COLUMN.
    */
  private[graft] def physName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  /** logical -> physical name map, differing entries only. */
  private[graft] def renameMap(s: org.apache.spark.sql.types.StructType)
      : Map[String, String] =
    s.fields.iterator.map(f => f.name -> physName(f))
      .filter(t => t._1 != t._2).toMap

  /** The logical schema re-expressed in on-disk names, mapping metadata
    * stripped — what the files (and the inner parquet scan) carry.
    */
  private[graft] def physicalSchema(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(s.fields.map(f =>
      org.apache.spark.sql.types.StructField(physName(f), f.dataType, f.nullable)))

  /** `_dv_file`/`_dv_idx` — the deletion-vector sidecar schema. Declared
    * on every dv read so planning never runs a schema-inference job over
    * sidecars whose shape is fixed by construction.
    */
  private[graft] val DvSidecarSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_dv_file",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_dv_idx",
        org.apache.spark.sql.types.LongType, nullable = false)))

  // ---- driver-side parquet footer metadata -------------------------------
  //
  // Every data and sidecar file of this format is staged through Spark's
  // parquet writer, which stamps the catalyst schema into the footer
  // (ParquetWriteSupport's row.metadata key) and per-column min/max/null
  // statistics into each row group. Reading a footer is one ranged RPC on
  // the driver — the table-format move (Delta/Iceberg keep schema + stats
  // in metadata precisely so that PLANNING never runs a distributed job).
  // Before round 12 every `spark.read.parquet(...)` without a declared
  // schema ran a schema-inference JOB (1 task, but a full job submission +
  // AQE round-trip); the DML family paid 2-4 of them per query.

  private val SparkSchemaKey = "org.apache.spark.sql.parquet.row.metadata"

  /** Recursive nullable=true, matching file-source schema inference. */
  private def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = asNullable(f.dataType), nullable = true)))
      case a: ArrayType =>
        ArrayType(asNullable(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(asNullable(m.keyType), asNullable(m.valueType),
          valueContainsNull = true)
      case other => other
    }
  }

  private case class FooterMeta(
      schema: Option[org.apache.spark.sql.types.StructType],
      rows: Long,
      // per-column (min, max, allNull) for INT32/INT64 plain-integer
      // columns with complete statistics; absent entry = not provable
      intStats: Map[String, (Long, Long, Boolean)])

  /** (absolute path, file length) -> footer. Staged files are immutable
    * once a manifest references them; the length guards a
    * delete-and-recreate at the same path.
    */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), FooterMeta]()

  private def footerOf(spark: SparkSession, p: Path): FooterMeta = {
    val conf = spark.sessionState.newHadoopConf()
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    footerCache.computeIfAbsent((p.toString, len), _ => {
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val fmd = r.getFooter.getFileMetaData
        // file-source contract: Spark treats EVERY column read from files
        // as nullable (its inference forces it; a writer-stamped
        // non-null field would let the optimizer constant-fold
        // `IS NULL` over old files that lack the column)
        val schema = Option(fmd.getKeyValueMetaData.get(SparkSchemaKey))
          .flatMap(j => scala.util.Try(
            asNullable(org.apache.spark.sql.types.DataType.fromJson(j))
              .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
        val blocks = r.getFooter.getBlocks
        import scala.jdk.CollectionConverters._
        // fold row groups per column; a column qualifies only when EVERY
        // block carries complete stats and the physical type is a plain
        // signed INT32/INT64 (no DATE/TIMESTAMP/unsigned annotation —
        // their catalyst min/max are not long-castable the same way)
        val perCol = scala.collection.mutable.Map
          .empty[String, Option[(Long, Long, Boolean)]]
        blocks.asScala.foreach { b =>
          b.getColumns.asScala.foreach { c =>
            if (c.getPath.size == 1) {
              val name = c.getPath.toDotString
              val pt = c.getPrimitiveType
              val plainInt =
                (pt.getPrimitiveTypeName == PrimitiveTypeName.INT32 ||
                  pt.getPrimitiveTypeName == PrimitiveTypeName.INT64) &&
                (pt.getLogicalTypeAnnotation == null ||
                  (pt.getLogicalTypeAnnotation match {
                    case a: org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                      a.isSigned
                    case _ => false
                  }))
              val st = c.getStatistics
              val block: Option[(Long, Long, Boolean)] =
                if (!plainInt || st == null || st.isEmpty) None
                else if (st.hasNonNullValue)
                  Some((st.genericGetMin match {
                    case i: java.lang.Integer => i.longValue
                    case l: java.lang.Long => l.longValue
                  }, st.genericGetMax match {
                    case i: java.lang.Integer => i.longValue
                    case l: java.lang.Long => l.longValue
                  }, false))
                else if (st.isNumNullsSet && st.getNumNulls == b.getRowCount)
                  Some((Long.MaxValue, Long.MinValue, true)) // all-null block
                else None
              perCol.get(name) match {
                case None => perCol(name) = block
                case Some(None) => // already disqualified
                case Some(Some((mn, mx, an))) => perCol(name) = block.map {
                  case (bmn, bmx, ban) =>
                    (math.min(mn, bmn), math.max(mx, bmx), an && ban)
                }
              }
            }
          }
        }
        FooterMeta(schema, r.getRecordCount,
          perCol.collect { case (k, Some(v)) => k -> v }.toMap)
      } finally r.close()
    })
  }

  /** Total rows across parquet files, from footers alone — no job. */
  private def footerRowCount(spark: SparkSession, paths: Seq[Path]): Long =
    paths.map(footerOf(spark, _).rows).sum

  /** The merged Spark schema of `files` (table-relative under `dir`) from
    * their footers' writer-stamped catalyst schemas, [[lenientMerge]]d on
    * the driver — the same widest-type result the old
    * mergeSchema-job-then-lenientMerge dance produced, without the job.
    * `strict` keeps the old no-`#schema=` contract: genuinely
    * incompatible twins fail AT PLANNING with the CANNOT_MERGE_SCHEMAS
    * marker instead of a confusing per-file cast error mid-read. None
    * when any file lacks the writer stamp (foreign file: callers fall
    * back to the distributed inference).
    */
  private[graft] def footerMergedSchema(spark: SparkSession, dir: String,
                                        files: Seq[String], strict: Boolean)
      : Option[org.apache.spark.sql.types.StructType] = {
    val schemas = files.map(f =>
      footerOf(spark, new Path(dir, f)).schema.getOrElse(return None))
    if (schemas.isEmpty) None
    else Some(lenientMerge(schemas,
      original = if (strict) Some(new org.apache.spark.SparkException(
        "[CANNOT_MERGE_SCHEMAS] incompatible file schemas under " +
          s"$dir and no #schema= metadata to arbitrate")) else None))
  }

  /** Is `from` → `to` a LOSSLESS type widening the parquet readers can
    * serve per file at read time (Spark's ParquetVectorUpdaterFactory
    * ships IntegerToLong / IntegerToDouble / FloatToDouble updaters, and
    * decimal precision growth re-scales on read)? This is the Delta/
    * Iceberg `ALTER COLUMN TYPE` widening subset: old files keep their
    * narrow physical type, new files write the wide one, and every read
    * requests the WIDE type so both decode correctly — no rewrite.
    */
  private[graft] def isSafeWidening(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (f, t) if f == t => true
      case (IntegerType, LongType) => true
      case (IntegerType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) =>
        d2.scale == d1.scale && d2.precision >= d1.precision
      case _ => false
    }
  }

  /** Union-by-name schema merge that tolerates WIDENED twins: where
    * Spark's `mergeSchema` read throws CANNOT_MERGE_SCHEMAS on an
    * int32-file/int64-file pair, this keeps the WIDER of two safely
    * widenable types (and the first otherwise — the #schema= metadata,
    * not this fallback, is authoritative whenever an ALTER ever ran).
    */
  private def lenientMerge(
      schemas: Seq[org.apache.spark.sql.types.StructType],
      original: Option[Throwable] = None)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val out = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    schemas.iterator.flatMap(_.fields).foreach { f =>
      out.get(f.name) match {
        case None => out(f.name) = f
        case Some(prev) =>
          if (isSafeWidening(prev.dataType, f.dataType))
            out(f.name) = f.copy(nullable = f.nullable || prev.nullable)
          else if (isSafeWidening(f.dataType, prev.dataType)) {
            if (prev.nullable != (prev.nullable || f.nullable))
              out(f.name) = prev.copy(nullable = true)
          } else {
            // genuinely incompatible twins (e.g. a string file next to an
            // int file) and no #schema= metadata to arbitrate: rethrow the
            // planner's original CANNOT_MERGE_SCHEMAS now, rather than
            // picking the first-seen type and deferring to a confusing
            // per-file cast error mid-read. With a declared schema the
            // first-seen pick is harmless — #schema= is authoritative.
            original.foreach(e => throw e)
            if (prev.nullable != (prev.nullable || f.nullable))
              out(f.name) = prev.copy(nullable = true)
          }
      }
    }
    StructType(out.values.toSeq)
  }

  /** Project a PHYSICAL-named frame to the logical schema: rename mapped
    * columns, null-fill logical columns no file carries yet, drop
    * physical columns outside the logical schema (DROPped), and pass
    * `passthrough` columns (hive partition / lineage columns) unchanged.
    * Identity when the snapshot has no `#schema=` line.
    */
  private[graft] def toLogical(df: DataFrame,
                               meta: Option[org.apache.spark.sql.types.StructType],
                               passthrough: Seq[String] = Seq.empty): DataFrame =
    meta.fold(df) { ls =>
      val present = df.columns.toSet
      val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val cols = ls.fields.toSeq.map { f =>
        val p = physName(f)
        if (present(p)) {
          // widened column read through a pre-widening file schema:
          // surface the DECLARED type (lossless by isSafeWidening)
          if (byName(p) != f.dataType) df(p).cast(f.dataType).as(f.name)
          else df(p).as(f.name)
        } else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      } ++ passthrough.filter(present).map(df(_))
      df.select(cols: _*)
    }

  /** mergeSchema-equivalent multi-file read that PLANS from footers when
    * possible: declared schema via [[footerMergedSchema]] (no inference
    * job), the distributed mergeSchema read only for foreign files.
    * basePath-derived hive partition columns append as usual.
    */
  private def readFiles(spark: SparkSession, dir: String, files: Seq[String],
                        basePath: Option[String] = None): DataFrame = {
    val r0 = spark.read.option("basePath", basePath.getOrElse(dir))
    footerMergedSchema(spark, dir, commitReps(files), strict = true)
      .fold(r0.option("mergeSchema", "true"))(r0.schema)
      .parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** One representative file per COMMIT (filename commit-id prefix):
    * schema can only change at commit granularity, so footer work scales
    * with commits in the snapshot, not files.
    */
  private def commitReps(files: Seq[String]): Seq[String] = {
    val baseName = (f: String) => f.drop(f.lastIndexOf('/') + 1)
    files.groupBy(f => baseName(f).takeWhile(_ != '-'))
      .values.map(_.head).toSeq
  }

  /** Hive partition column names as the manifest's file paths spell
    * them (first file line is representative — commit layouts agree).
    */
  private def pathPartCols(files: Seq[String]): Seq[String] =
    files.headOption.filter(_.contains("/")).toSeq.flatMap(f =>
      f.split('/').init.toSeq.filter(_.contains('=')).map(_.takeWhile(_ != '=')))

  /** Current logical data schema of the tip: the `#schema=` metadata when
    * present, else the file-derived (mergeSchema) data schema.
    */
  def logicalSchema(spark: SparkSession, dir: String)
      : org.apache.spark.sql.types.StructType = {
    val lines = versions(spark, dir).lastOption
      .map(manifestLines(spark, dir, _)).getOrElse(Seq.empty)
    metaSchema(lines).getOrElse(snapshotIndex(spark, dir, None, None)._2)
  }

  /** ALTER TABLE core: commit `f(currentLogicalSchema)` as the new
    * `#schema=` metadata — a METADATA-ONLY commit (files, dv lines, and
    * layout all carry forward untouched; time travel to an earlier
    * version sees the earlier schema). Validates that logical names are
    * unique, that no logical name collides with another field's physical
    * name (keeps write-side renaming unambiguous even for physical-named
    * rewrite frames), and that partition/layout/constraint-referenced
    * columns are not renamed or dropped.
    */
  def alterSchema(spark: SparkSession, dir: String)(
      f: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType): Long = {
    import org.apache.spark.sql.types.StructType
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir; " +
      "alter the declared schema (sidecar) instead")
    val lines = manifestLines(spark, dir, vs.last)
    val current = metaSchema(lines).getOrElse(
      snapshotIndex(spark, dir, None, None)._2)
    val next = f(current)
    // -- validation ---------------------------------------------------
    val names = next.fields.map(_.name)
    require(names.distinct.length == names.length,
      s"duplicate logical column names: ${names.mkString(",")}")
    val phys = next.fields.map(physName)
    require(phys.distinct.length == phys.length,
      s"duplicate physical column names: ${phys.mkString(",")}")
    next.fields.foreach { fl =>
      val clash = next.fields.exists(o => (o ne fl) && physName(o) == fl.name)
      require(!clash, s"logical name ${fl.name} collides with another " +
        "column's on-disk name; rename that column first")
    }
    val partCols = pathPartCols(lines.filterNot(_.startsWith("#")))
    val layoutSrc = layoutTransforms(lines).flatMap(t => Seq(t.source, t.dirCol))
    val protectedCols = (partCols ++ layoutSrc).toSet
    // a logical data column may never shadow a hive partition / hidden
    // layout directory column (reads would turn ambiguous)
    val partAndDir = (partCols ++ layoutTransforms(lines).map(_.dirCol)).toSet
    next.fields.foreach(f => require(!partAndDir.contains(f.name),
      s"logical name ${f.name} collides with a partition/layout column"))
    val currentByName = current.fields.map(f => f.name -> f).toMap
    val removedOrRenamed = current.fields.filter(cf =>
      !next.fields.exists(nf => nf.name == cf.name && physName(nf) == physName(cf)))
    removedOrRenamed.foreach(cf => require(!protectedCols.contains(cf.name),
      s"column ${cf.name} is a partition/layout column and cannot be " +
        "renamed or dropped"))
    val constraintRefs = lines.filter(_.startsWith("#check="))
      .map(_.stripPrefix("#check=").split("\\|", 2)(1))
      .flatMap(sql => spark.sessionState.sqlParser.parseExpression(sql)
        .collect { case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name })
      .toSet
    removedOrRenamed.foreach(cf => require(!constraintRefs.contains(cf.name),
      s"column ${cf.name} is referenced by a CHECK constraint; drop the " +
        "constraint first"))
    // type changes: the WIDENING subset only (int→long, int/float→double,
    // decimal precision growth) — served by the parquet readers' per-file
    // upcast at read time (isSafeWidening). Anything lossy (narrowing,
    // cross-family) still refuses: old files could hold values the new
    // type cannot represent, and a read-time cast would corrupt silently.
    current.fields.foreach { cf =>
      next.fields.find(nf => physName(nf) == physName(cf)).foreach(nf =>
        require(isSafeWidening(cf.dataType, nf.dataType),
          s"cannot change type of ${cf.name}: ${cf.dataType.simpleString} " +
            s"-> ${nf.dataType.simpleString} is not a lossless widening " +
            "(int->long, int/float->double, decimal precision growth); " +
            "rewrite the table instead"))
    }
    val _ = currentByName // (kept for clarity of the diff-based checks)
    val line = "#schema=" + StructType(next.fields.toIndexedSeq).json
    commit(spark, dir, identity[Seq[String]], op = "alter",
      mkProps = props => props.filterNot(_.startsWith("#schema=")) :+ line).get
  }

  /** `#tblprop=` metadata: one JSON-object line, replaced wholesale by
    * SET/UNSET TBLPROPERTIES commits, carried forward otherwise.
    */
  private[graft] def metaProps(lines: Seq[String]): Map[String, String] =
    lines.filter(_.startsWith("#tblprop=")).lastOption
      .map(l => parsePropsJson(l.stripPrefix("#tblprop=")))
      .getOrElse(Map.empty)

  private def parsePropsJson(s: String): Map[String, String] = {
    // tiny flat {"k":"v",...} parser via StructType metadata round-trip
    // (values are always strings we wrote ourselves)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(s)
    val it = node.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
    b.result()
  }

  private def propsJson(m: Map[String, String]): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    om.writeValueAsString(node)
  }

  /** Tip's table properties (SET TBLPROPERTIES surface). */
  def tableProperties(spark: SparkSession, dir: String): Map[String, String] =
    versions(spark, dir).lastOption
      .map(v => metaProps(manifestLines(spark, dir, v))).getOrElse(Map.empty)

  /** SET / UNSET TBLPROPERTIES as a metadata-only commit. */
  def setTableProperties(spark: SparkSession, dir: String,
                         set: Map[String, String],
                         unset: Seq[String] = Seq.empty): Long = {
    require(versions(spark, dir).nonEmpty, s"no committed versions under $dir")
    commit(spark, dir, identity[Seq[String]], op = "alter",
      mkProps = props => {
        val cur = props.filter(_.startsWith("#tblprop=")).lastOption
          .map(l => parsePropsJson(l.stripPrefix("#tblprop="))).getOrElse(Map.empty)
        val next = (cur ++ set) -- unset
        props.filterNot(_.startsWith("#tblprop=")) ++
          (if (next.isEmpty) Seq.empty
           else Seq("#tblprop=" + propsJson(next)))
      }).get
  }

  /** `#check=<name>|<sql>` table constraints of the tip manifest. */
  def constraints(spark: SparkSession, dir: String): Seq[(String, String)] =
    versions(spark, dir).lastOption.toSeq
      .flatMap(manifestLines(spark, dir, _))
      .filter(_.startsWith("#check="))
      .map(_.stripPrefix("#check=").split("\\|", 2))
      .collect { case Array(n, sql) => (n, sql) }

  /** Declare a CHECK constraint (Delta `ALTER TABLE ADD CONSTRAINT`):
    * a metadata-only commit recording `#check=<name>|<sql>`; every later
    * [[append]]/[[overwrite]]/[[upsert]] REJECTS (no commit, staged files
    * never referenced) any batch containing a row where the expression
    * evaluates to FALSE — NULL passes, per SQL CHECK semantics. The
    * declaring commit itself validates the CURRENT snapshot first, so a
    * constraint can never be added to a table already violating it.
    */
  def addConstraint(spark: SparkSession, dir: String,
                    name: String, sql: String): Long = {
    require(!name.contains("|") && !sql.contains("\n"),
      "constraint name must not contain '|'; sql must be single-line")
    val existing = read(spark, dir)
    val bad = violations(existing, Seq((name, sql)))
    require(bad.isEmpty,
      s"cannot add constraint $name: current snapshot violates it")
    commit(spark, dir, identity[Seq[String]],
      op = s"add_constraint($name)",
      extraProps = Seq(s"#check=$name|$sql")).get
  }

  /** Names of constraints a batch violates (a row where the expression is
    * definitely FALSE; NULL passes). One job over the batch regardless of
    * constraint count.
    */
  private def violations(df: DataFrame,
                         checks: Seq[(String, String)]): Seq[String] = {
    if (checks.isEmpty) return Seq.empty
    import org.apache.spark.sql.functions.{count, expr, when, lit}
    val aggs = checks.map { case (n, sql) =>
      count(when(expr(sql) === lit(false), 1)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    checks.zipWithIndex.collect {
      case ((n, _), i) if row.getLong(i) > 0 => n
    }
  }

  /** Enforce the tip's CHECK constraints on a write batch or abort. */
  private def enforceConstraints(spark: SparkSession, dir: String,
                                 df: DataFrame): Unit = {
    val checks = constraints(spark, dir)
    val bad = violations(df, checks)
    if (bad.nonEmpty) throw new IllegalStateException(
      s"write to $dir rejected: CHECK constraint(s) violated: " +
        bad.mkString(", "))
  }

  /** The greatest version whose manifest existed at `tsMillis` — Delta's
    * `TIMESTAMP AS OF` resolution (manifest modification time is the
    * commit time; manifests are immutable after the atomic create).
    */
  def versionAsOf(spark: SparkSession, dir: String, tsMillis: Long): Long = {
    val fs = fsOf(spark, dir)
    val eligible = versions(spark, dir).filter(v =>
      fs.getFileStatus(logFileOf(fs, dir, v)).getModificationTime <= tsMillis)
    require(eligible.nonEmpty,
      s"no version of $dir existed at $tsMillis (or it was vacuumed)")
    eligible.max
  }

  /** Scan `files` with row lineage attached: `_dv_file` (manifest-relative
    * source path) + `_dv_idx` (row index inside the file) via the parquet
    * `_metadata` column — deterministic and join-safe, unlike
    * `input_file_name()` which loses meaning after the first join.
    */
  private def lineageScan(spark: SparkSession, dir: String,
                          files: Seq[String],
                          // declared PHYSICAL schema: required instead of
                          // mergeSchema once a column was ever WIDENED
                          // (mixed-width files refuse to schema-merge)
                          declared: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    import org.apache.spark.sql.functions.substring_index
    val qd = qualifiedDir(spark, dir)
    val r0 = spark.read.option("basePath", dir)
    // no declared schema: derive one from the files' own footers on the
    // driver (same merge the mergeSchema inference job would run) so
    // planning costs no job; distributed inference only for foreign files
    val schema = declared.orElse(
      footerMergedSchema(spark, dir, commitReps(files), strict = true))
    schema.fold(r0.option("mergeSchema", "true"))(r0.schema)
      .parquet(files.map(f => s"$dir/$f"): _*)
      .withColumn("_dv_file",
        substring_index(col("_metadata.file_path"), qd + "/", -1))
      .withColumn("_dv_idx", col("_metadata.row_index"))
  }

  /** Drop rows listed in the snapshot's deletion vectors (merge-on-read):
    * an anti-join of the lineage-tagged scan against the union of the dv
    * sidecars. No-op (and no plan overhead) when the manifest carries no
    * dv lines. The dv side is deleted-row-count–sized, so the join
    * broadcast-resolves under AQE for the selective deletes dvs exist
    * for.
    */
  private def applyDv(spark: SparkSession, dir: String,
                      tagged: DataFrame, dvs: Seq[String]): DataFrame =
    if (dvs.isEmpty) tagged
    else {
      val dv = spark.read.schema(DvSidecarSchema)
        .parquet(dvs.map(f => s"$dir/$f"): _*)
        .select(col("_dv_file"), col("_dv_idx"))
      tagged.join(dv, Seq("_dv_file", "_dv_idx"), "left_anti")
    }

  /** Whole-segment hive-partition match: `market=2/et=1/f` satisfies
    * (market,2) and (et,1), and nothing else — substring matching once
    * let one partition column's name suffix another's.
    */
  private def inPartition(file: String, c: String, value: String): Boolean =
    file.split('/').init.contains(s"$c=$value")

  /** Transaction tokens recorded by retained manifests (vacuumed versions
    * lose theirs — see [[appendIdempotent]]'s retention caveat).
    */
  def committedTxns(spark: SparkSession, dir: String): Set[String] =
    versions(spark, dir)
      .flatMap(versionMeta(spark, dir, _))
      .filter(_.startsWith("#txn="))
      .map(_.stripPrefix("#txn="))
      .toSet

  /** Per-JVM incremental token index: manifests are immutable once
    * written, so each call reads only versions newer than the last scan —
    * a streaming sink committing one version per micro-batch pays O(1)
    * manifest reads per append instead of O(versions) (the committedTxns
    * full scan made the sink quadratic over its lifetime). Tokens from
    * since-vacuumed manifests stay cached; that is conservative in the
    * safe direction (a replay can only be *skipped*, never duplicated).
    * Writers in OTHER processes are still seen: their commits are new
    * manifests, which the next incremental scan picks up. Deleting and
    * recreating a table at the same path resets the cache when the tip
    * version regresses below the watermark; a recreate that races past
    * the old watermark before the next append is not detectable from
    * version numbers — use a fresh path for a logically new table.
    */
  private val txnCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Set[String])]()

  private def txnsSeen(spark: SparkSession, dir: String): Set[String] =
    txnCache.compute(dir, (_, prev) => {
      val vs = versions(spark, dir)
      val (scanned, known) =
        Option(prev)
          // a tip LOWER than the watermark means the table was deleted and
          // recreated at this path — stale watermark+tokens would both
          // skip legitimate first-time appends and miss new tokens; start
          // over from the actual log
          .filter { case (watermark, _) =>
            vs.lastOption.getOrElse(0L) >= watermark }
          .getOrElse((0L, Set.empty[String]))
      val fresh = vs.filter(_ > scanned)
      val tokens = known ++ fresh
        .flatMap(versionMeta(spark, dir, _))
        .filter(_.startsWith("#txn="))
        .map(_.stripPrefix("#txn="))
      (fresh.lastOption.getOrElse(scanned), tokens)
    })._2

  /** Write `df`'s rows as data files carrying `commitId` in their names;
    * returns the new file names (RELATIVE paths — partitioned writes keep
    * their `col=val/` directory structure, which is both the partition
    * encoding Spark re-derives on read and what [[read]]'s manifest-level
    * pruning matches against). Staged fully before any manifest points at
    * them.
    */
  private def writeDataFiles(spark: SparkSession, dir: String, df: DataFrame,
                             commitId: String,
                             partitionBy: Seq[String] = Seq.empty): Seq[String] = {
    val fs = fsOf(spark, dir)
    // column mapping: logical-named batches write under their ON-DISK
    // names, keeping every file physically consistent across renames.
    // Physical-named frames (partition-scoped rewrites) pass through
    // untouched: alterSchema guarantees no logical name ever equals
    // another column's physical name, so the map can't mis-fire on them.
    val l2p = versions(spark, dir).lastOption
      .map(v => metaSchema(manifestLines(spark, dir, v)))
      .flatten.map(renameMap).getOrElse(Map.empty)
    val mapped =
      if (l2p.isEmpty || !df.columns.exists(l2p.contains)) df
      else df.select(df.columns.toIndexedSeq.map(c =>
        df(c).as(l2p.getOrElse(c, c))): _*)
    val stage = new Path(dir, s".stage-$commitId")
    val w = mapped.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(stage.toString)
    // qualified: listFiles returns absolute paths even when dir is relative
    val stageUri = fs.makeQualified(stage).toUri.getPath
    val parts = fs.listFiles(stage, true)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (parts.hasNext) {
      val s = parts.next()
      if (s.isFile && s.getPath.getName.startsWith("part-")) {
        val rel = s.getPath.toUri.getPath.stripPrefix(stageUri).stripPrefix("/")
        val relDir = rel.lastIndexOf('/') match {
          case -1 => ""
          case i  => rel.substring(0, i + 1)
        }
        val name = s"$relDir$commitId-${s.getPath.getName}"
        if (relDir.nonEmpty) fs.mkdirs(new Path(dir, relDir))
        if (!fs.rename(s.getPath, new Path(dir, name)))
          throw new java.io.IOException(s"stage move failed for $name")
        out += name
      }
    }
    fs.delete(stage, true)
    out.toList
  }

  /** Put `bytes` at `path` atomically, failing if `path` already exists.
    * On the local filesystem Hadoop's `create(path, overwrite=false)` is a
    * check-then-create (TOCTOU: two racing writers can both "win", the
    * second truncating the first), so there we write a temp file and
    * hard-link it into place — POSIX `link(2)` is atomic, all-or-nothing,
    * and fails with EEXIST if the destination exists, which also means a
    * concurrent reader can never observe a partially-written manifest.
    * Other filesystems fall back to `create(overwrite=false)` (atomic on
    * HDFS's namenode); true object stores need an external commit
    * coordinator for this primitive, exactly as Delta's LogStore does.
    * Returns true if this writer won the version.
    */
  private def atomicPutIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
                                path: Path, bytes: Array[Byte]): Boolean =
    if (fs.getScheme == "file") {
      val dest = java.nio.file.Paths.get(path.toUri.getPath)
      val tmp = dest.resolveSibling(
        s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        java.nio.file.Files.write(tmp, bytes) // inside try: a failed write
        // (disk full) must still reach the finally-cleanup; a hard crash
        // between write and delete leaks the tmp — vacuum sweeps those
        try { java.nio.file.Files.createLink(dest, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      try {
        val out = fs.create(path, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: java.io.IOException if fs.exists(path) => false
      }
    }

  /** Create-no-overwrite commit as the next version; `mkFiles` maps the
    * CURRENT tip's file list to the new manifest and is re-evaluated on
    * every attempt, so a committer that loses the race to version N
    * re-bases on N's manifest before trying N+1 — without this, a losing
    * APPEND would silently drop the winner's files (lost update).
    * Returns the committed version.
    */
  private def commit(spark: SparkSession, dir: String,
                     mkFiles: Seq[String] => Seq[String],
                     txn: Option[String] = None,
                     freshStats: Map[String, Map[String, (Long, Long)]] = Map.empty,
                     op: String = "write",
                     // tip's #dvp lines -> the new manifest's (re-evaluated
                     // per retry, like mkFiles, so dv commits rebase on a
                     // racing writer's). Default: carry them forward.
                     mkDv: Seq[String] => Seq[String] = identity,
                     // `#layout=` hidden-partitioning transforms: a table
                     // property — declared by the first transformed append,
                     // carried forward by every later commit
                     layout: Seq[String] = Seq.empty,
                     // additional `#`-metadata lines to ADD this commit
                     // (table properties like `#check=` constraints);
                     // existing #check=/#schema=/#tblprop= lines always
                     // carry forward
                     extraProps: Seq[String] = Seq.empty,
                     // ALTER TABLE's hook: maps the carried property-line
                     // set to the new one (replace `#schema=`, rewrite
                     // `#tblprop=`); re-evaluated per retry like mkFiles
                     mkProps: Seq[String] => Seq[String] = identity)
      : Option[Long] = {
    val fs = fsOf(spark, dir)
    fs.mkdirs(new Path(dir, LogDir))
    var committed = -1L
    while (committed < 0) {
      // the txn check lives INSIDE the retry loop: two retries of the same
      // batch can race past an outside check, but the loser re-enters here
      // after losing the create and sees the winner's token
      txn.foreach(t =>
        if (txnsSeen(spark, dir).contains(t)) return None)
      val tip = versions(spark, dir).lastOption
      val tipLines = tip.map(manifestLines(spark, dir, _)).getOrElse(Seq.empty)
      val base = tipLines.filterNot(_.startsWith("#"))
      val v = tip.getOrElse(0L) + 1
      val files = mkFiles(base)
      // stats travel with their files: fresh commits bring their own,
      // carried files inherit the tip's (keeps manifests self-contained)
      val carried = fileStats(tipLines)
      val stats = files.flatMap(f =>
        freshStats.get(f).orElse(carried.get(f))
          .toSeq.flatMap(statsLines(f, _)))
      val dv = mkDv(dvLines(tipLines))
      val lay =
        if (layout.nonEmpty) layout
        else tipLines.filter(_.startsWith("#layout="))
      val props = mkProps(
        (tipLines.filter(l => l.startsWith("#check=") ||
          l.startsWith("#schema=") || l.startsWith("#tblprop=")) ++
          extraProps).distinct)
      val state = files ++ stats ++ dv ++ lay ++ props
      val perVersion = txn.map(t => s"#txn=$t").toSeq :+ s"#op=$op"
      // The commit CAS is ALWAYS on the version's .delta path — one
      // format-NEUTRAL decision point per version. The checkpoint cadence
      // (below) only decides whether a full manifest is ADDITIONALLY
      // materialized after the win, so writers configured with different
      // checkpointInterval values can race safely: both contend on the
      // same path and exactly one wins. (Deciding manifest-vs-delta as
      // the CAS target would let a k=1 writer and a k=10 writer both
      // "win" version v on different paths — a silent lost update, since
      // logFileOf prefers the manifest.)
      val oldState = tipLines.filterNot(isPerVersion)
      val newSet = state.toSet
      val oldSet = oldState.toSet
      val edits = perVersion ++
        oldState.filterNot(newSet).map("-" + _) ++
        state.filterNot(oldSet).map("+" + _)
      val target = deltaPath(dir, v)
      if (atomicPutIfAbsent(fs, target,
        (edits.mkString("\n") + "\n").getBytes("UTF-8"))) {
        // checkpoint cadence: v=1 is always full (a base every resolution
        // terminates on), then every k-th version. The manifest is a
        // DERIVED artifact of the won commit: an atomic put that inherits
        // the delta's mtime so TIMESTAMP AS OF answers identically via
        // either file; a crash before it lands just leaves v resolvable
        // through its delta (vacuum's floor materialization heals floors).
        val k = checkpointInterval(spark)
        if (k <= 1 || v == 1L || v % k == 0) {
          val mp = manifestPath(dir, v)
          if (atomicPutIfAbsent(fs, mp,
            ((state ++ perVersion).mkString("\n") + "\n").getBytes("UTF-8"))) {
            try fs.setTimes(mp, fs.getFileStatus(target).getModificationTime, -1)
            catch { case _: java.io.IOException => () }
          }
        }
        // seed the resolver cache with the snapshot we just committed —
        // unconditional put (not merge): the winning committer KNOWS v is
        // the table's current tip, which also self-heals a stale entry
        // left by a delete-and-recreate at the same path
        try snapCache.put(cacheKey(fs, dir),
          (v, logFileId(fs, target), state))
        catch { case _: java.io.IOException => () }
        committed = v
        // change-data materialization (opt-in, see maybeMaterializeChanges):
        // runs AFTER the CAS win, against the exact pre/post line sets of
        // the won commit — a failure here leaves the commit durable and
        // the feed serving this version via reconstruction
        maybeMaterializeChanges(spark, dir, v, op, tipLines, state)
      }
    }
    Some(committed)
  }

  /** Per-file min/max of each of `cols` for freshly staged files,
    * recorded as `#stats=<relpath>|<col>|<min>|<max>` manifest metadata
    * (one line per file×column) — Delta-style file statistics, computed
    * in ONE job regardless of column count (group by input_file_name,
    * paired min/max aggregates), consulted by [[read]]'s `skip` and
    * [[table]]'s automatic pruning without opening a single parquet
    * footer at plan time.
    */
  private def collectStats(spark: SparkSession, dir: String,
                           fresh: Seq[String], cols: Seq[String])
      : Map[String, Map[String, (Long, Long)]] = {
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    if (fresh.isEmpty || cols.isEmpty) Map.empty
    else {
      // staged files carry PHYSICAL names; callers may pass logical ones
      val l2p = versions(spark, dir).lastOption
        .map(v => metaSchema(manifestLines(spark, dir, v)))
        .flatten.map(renameMap).getOrElse(Map.empty)
      val physCols = cols.map(c => l2p.getOrElse(c, c)).distinct
      // fast path: the freshly written parquet FOOTERS already carry
      // exact per-row-group min/max for plain integer columns — fold them
      // on the driver instead of re-scanning the data just written (the
      // stats job was one full extra read per stats-carrying commit).
      // Only taken when EVERY (file, col) is provable from footers
      // (plain signed INT32/INT64, complete statistics); the scan job
      // remains the exact fallback for every other type.
      def fromFooters(): Option[Map[String, Map[String, (Long, Long)]]] = {
        val perFile = fresh.map { f =>
          val meta = footerOf(spark, new Path(dir, f))
          val perCol = physCols.flatMap { c =>
            meta.intStats.get(c) match {
              case None => return None // not provable -> scan fallback
              case Some((_, _, true)) => None // all-null: no stats line
              case Some((mn, mx, false)) => Some(c -> ((mn, mx)))
            }
          }.toMap
          f -> perCol
        }
        Some(perFile.filter(_._2.nonEmpty).toMap)
      }
      fromFooters().getOrElse {
        val aggs = physCols.flatMap(c => Seq(
          fmin(col(c)).cast("long").as(s"mn_$c"),
          fmax(col(c)).cast("long").as(s"mx_$c")))
        spark.read.option("basePath", dir)
          .parquet(fresh.map(f => s"$dir/$f"): _*)
          .groupBy(input_file_name().as("_f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect().toSeq
          .map { r =>
            val perCol = physCols.zipWithIndex.flatMap { case (c, i) =>
              val (mnI, mxI) = (1 + 2 * i, 2 + 2 * i)
              if (r.isNullAt(mnI) || r.isNullAt(mxI)) None
              else Some(c -> ((r.getLong(mnI), r.getLong(mxI))))
            }.toMap
            toRelative(spark, dir, r.getString(0)) -> perCol
          }
          .filter(_._2.nonEmpty)
          .toMap
      }
    }
  }

  /** Append `df` to the table; returns the new version. `partitionBy`
    * lays the commit's files out hive-style (`col=val/...`) — the layout
    * [[read]] prunes on and Spark re-derives partition columns from.
    * Use the same columns for every commit to a table. `statsCol` records
    * per-file min/max of a (long-castable) column in the manifest for
    * [[read]]'s value-range data skipping.
    */
  def append(spark: SparkSession, dir: String, df: DataFrame,
             partitionBy: Seq[String] = Seq.empty,
             statsCol: Option[String] = None,
             // Iceberg-style hidden partitioning: each transform derives a
             // layout column (days/bucket/truncate of a source column),
             // written as a hive directory and recorded as `#layout=`
             // metadata; [[table]] hides the derived column and prunes it
             // from predicates on the SOURCE column
             transforms: Seq[graft.sources.PartTransform] = Seq.empty,
             // additional skipping columns: one #stats= line per
             // file×column, all consulted by [[table]]'s auto-pruning
             statsCols: Seq[String] = Seq.empty,
             // Delta's "optimized writes": shuffle the batch onto its
             // partition values first, so each partition directory
             // receives ONE file per commit instead of one per task —
             // the small-files guard for wide clusters writing many
             // partitions (trade: one extra shuffle per append)
             optimizeWrite: Boolean = false): Long = {
    enforceConstraints(spark, dir, df)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val derived = transforms.foldLeft(df)((d, t) =>
      d.withColumn(t.dirCol, t.derive))
    val layoutCols = partitionBy ++ transforms.map(_.dirCol)
    val arranged =
      if (optimizeWrite && layoutCols.nonEmpty)
        // EXPLICIT partition count: a bare repartition(cols) lets AQE
        // coalesce the layout exchange to ~minPartitionSize chunks — at
        // MB scale that is 2-3 WRITE TASKS serially emitting one file per
        // directory (measured 1.4 s for ~120 dirs). Pinning the count
        // keeps writers as wide as the session's parallelism while the
        // hash-on-layout-values still lands each directory's rows in one
        // task → still exactly one file per dir per commit.
        derived.repartition(spark.sparkContext.defaultParallelism,
          layoutCols.map(col): _*)
      else derived
    val fresh = writeDataFiles(spark, dir, arranged, commitId, layoutCols)
    val stats = collectStats(spark, dir, fresh,
      (statsCol.toSeq ++ statsCols).distinct)
    commit(spark, dir, base => base ++ fresh, freshStats = stats,
      op = "append",
      layout = transforms.map(t => s"#layout=${t.line}")).get
  }

  /** Exactly-once append: a no-op returning None when a commit carrying
    * `txn` already exists — Delta's `txn` pattern, sized for Structured
    * Streaming's `foreachBatch` where a micro-batch is re-delivered after
    * crash/restart (token = `"<queryName>-<batchId>"`). The token rides in
    * the winning manifest, the duplicate's staged files are deleted, and
    * the check re-runs inside the commit retry loop so even two
    * simultaneous retries serialize correctly.
    *
    * Retention caveat (same as Delta's): [[vacuum]] drops old manifests
    * and their tokens with them — keep `keepVersions` above the deepest
    * possible replay horizon of the writer.
    */
  def appendIdempotent(spark: SparkSession, dir: String, df: DataFrame,
                       txn: String,
                       partitionBy: Seq[String] = Seq.empty): Option[Long] = {
    if (txnsSeen(spark, dir).contains(txn)) return None // incremental fast path
    enforceConstraints(spark, dir, df)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val fresh = writeDataFiles(spark, dir, df, commitId, partitionBy)
    val v = commit(spark, dir, base => base ++ fresh, txn = Some(txn),
      op = "append")
    if (v.isEmpty) { // lost to a racing retry of the same batch
      val fs = fsOf(spark, dir)
      fresh.foreach(f => fs.delete(new Path(dir, f), false))
    }
    v
  }

  /** Replace the table's contents with `df`; returns the new version. */
  def overwrite(spark: SparkSession, dir: String, df: DataFrame,
                partitionBy: Seq[String] = Seq.empty,
                statsCol: Option[String] = None,
                transforms: Seq[graft.sources.PartTransform] = Seq.empty,
                statsCols: Seq[String] = Seq.empty,
                optimizeWrite: Boolean = false): Long = {
    if (versions(spark, dir).nonEmpty) enforceConstraints(spark, dir, df)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val derived = transforms.foldLeft(df)((d, t) =>
      d.withColumn(t.dirCol, t.derive))
    val layoutCols = partitionBy ++ transforms.map(_.dirCol)
    val arranged =
      if (optimizeWrite && layoutCols.nonEmpty)
        // explicit count for the same AQE-coalescing reason as [[append]]
        derived.repartition(spark.sparkContext.defaultParallelism,
          layoutCols.map(col): _*)
      else derived
    val fresh = writeDataFiles(spark, dir, arranged, commitId, layoutCols)
    val stats = collectStats(spark, dir, fresh,
      (statsCol.toSeq ++ statsCols).distinct)
    // a full overwrite replaces the row set wholesale — prior deletion
    // vectors are void and must not leak into the new snapshot
    commit(spark, dir, _ => fresh, freshStats = stats, op = "overwrite",
      mkDv = _ => Seq.empty,
      layout = transforms.map(t => s"#layout=${t.line}")).get
  }

  /** The tip's physical layout, re-derived from its manifest: hive
    * partition columns (path segments minus hidden-transform dirs, in
    * path order), hidden-partitioning transforms (`#layout=`), and the
    * columns carrying `#stats=` skipping metadata.
    */
  private def tipLayout(lines: Seq[String])
      : (Seq[String], Seq[graft.sources.PartTransform], Seq[String]) = {
    val files = lines.filterNot(_.startsWith("#"))
    val transforms = layoutTransforms(lines)
    val dirCols = transforms.map(_.dirCol).toSet
    // derived from ALL file lines, not the first: on a mixed-layout tip
    // (API appends with differing partitionBy, or an unpartitioned file
    // listed first) the MOST COMMON layout wins, so one stray file can't
    // silently flatten every later SQL insert
    val partCols = files.map(f =>
        f.split('/').init.map(_.split('=')(0)).toSeq.filterNot(dirCols))
      .groupBy(identity).toSeq
      .sortBy { case (cols, fs) => (-fs.size, -cols.length) }
      .headOption.map(_._1).getOrElse(Seq.empty)
    val statsCols = fileStats(lines).values.flatMap(_.keys).toSeq.distinct.sorted
    (partCols, transforms, statsCols)
  }

  /** Append matching the TIP's layout — the SQL write path's entry
    * (`INSERT INTO graft.s.n` must not flatten a partitioned table's
    * hive layout, drop its hidden-partitioning transforms, or stop
    * recording the skipping stats every earlier commit recorded).
    * `fallbackPartitionBy` seeds the layout of a table with no commits
    * yet (CREATE TABLE's declared PARTITIONED BY columns).
    */
  def appendLikeTip(spark: SparkSession, dir: String, df: DataFrame,
                    fallbackPartitionBy: Seq[String] = Seq.empty): Long = {
    val vs = versions(spark, dir)
    if (vs.isEmpty)
      append(spark, dir, df, partitionBy = fallbackPartitionBy,
        optimizeWrite = true)
    else {
      val (partCols, transforms, statsCols) =
        tipLayout(manifestLines(spark, dir, vs.last))
      append(spark, dir, df, partitionBy = partCols, transforms = transforms,
        statsCols = statsCols, optimizeWrite = true)
    }
  }

  /** Overwrite matching the tip's layout — `INSERT OVERWRITE`'s entry;
    * see [[appendLikeTip]].
    */
  def overwriteLikeTip(spark: SparkSession, dir: String, df: DataFrame,
                       fallbackPartitionBy: Seq[String] = Seq.empty): Long = {
    val vs = versions(spark, dir)
    if (vs.isEmpty)
      overwrite(spark, dir, df, partitionBy = fallbackPartitionBy,
        optimizeWrite = true)
    else {
      val (partCols, transforms, statsCols) =
        tipLayout(manifestLines(spark, dir, vs.last))
      overwrite(spark, dir, df, partitionBy = partCols,
        transforms = transforms, statsCols = statsCols, optimizeWrite = true)
    }
  }

  /** Partition-scoped OVERWRITE — static `INSERT OVERWRITE t PARTITION
    * (p=v)` and the API's partitioned backfill (reference surface: the
    * fact table's partitioned overwrite,
    * /root/reference/src/gold/facts/fact_adverse_events.py:325-327):
    * replaces exactly the files whose hive path matches EVERY
    * (col, value) pair with the staged batch; every other file carries
    * into the new version untouched — a pure manifest operation on the
    * untouched side (no file outside the target partition is read or
    * rewritten — at a million files, a quarterly backfill moves one
    * partition directory's worth of data, full stop).
    *
    * The replaced set re-derives from the CURRENT tip inside the commit
    * retry loop, so racing appends into OTHER partitions compose; a
    * racing append into the TARGET partition is replaced too
    * ("partition := batch" declarative semantics, Spark's
    * static-partition-overwrite contract). Staged files are validated
    * PATH-level against the target: a batch carrying rows outside the
    * named partition aborts (staged files deleted) instead of silently
    * leaking rows into partitions the statement never named.
    * Deletion-vector entries for replaced files become inert with their
    * files; entries for carried files keep applying.
    */
  def overwritePartitions(spark: SparkSession, dir: String, df: DataFrame,
                          partValues: Seq[(String, String)]): Long = {
    require(partValues.nonEmpty, "overwritePartitions needs at least one " +
      "(column, value) pair; use overwrite for the full table")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir")
    enforceConstraints(spark, dir, df)
    val (partCols, transforms, statsCols) =
      tipLayout(manifestLines(spark, dir, vs.last))
    val missing = partValues.map(_._1).filterNot(partCols.contains)
    require(missing.isEmpty,
      s"overwritePartitions: ${missing.mkString(",")} not partition " +
        s"column(s) of $dir (layout: ${partCols.mkString(",")})")
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val derived = transforms.foldLeft(df)((d, t) =>
      d.withColumn(t.dirCol, t.derive))
    val layoutCols = partCols ++ transforms.map(_.dirCol)
    val arranged = derived.repartition(layoutCols.map(col): _*)
    val fresh = writeDataFiles(spark, dir, arranged, commitId, layoutCols)
    def inTarget(f: String) =
      partValues.forall { case (c, v) => inPartition(f, c, v) }
    val fs = fsOf(spark, dir)
    val stray = fresh.filterNot(inTarget)
    if (stray.nonEmpty) {
      fresh.foreach(f => fs.delete(new Path(dir, f), false))
      throw new IllegalArgumentException(
        s"overwritePartitions: batch carries rows outside the target " +
          s"partition ${partValues.map { case (c, v) => s"$c=$v" }.mkString("/")}" +
          s" (e.g. ${stray.head}); aborted, nothing committed")
    }
    val stats = collectStats(spark, dir, fresh, statsCols)
    commit(spark, dir,
      base => fresh ++ base.filterNot(inTarget),
      freshStats = stats, op = "overwrite_partitions").get
  }

  /** Snapshot read: the latest version, or a pinned one (time travel).
    * An empty manifest (overwrite with zero rows) yields an empty frame
    * only when the caller's schema is recoverable — callers keep at least
    * one file per snapshot in practice (parquet writers always emit one).
    */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None,
           partitionFilter: Seq[(String, String)] = Seq.empty,
           skip: Option[(String, Long, Long)] = None,
           // Delta TIMESTAMP AS OF: greatest version committed <= ts
           asOfTimestamp: Option[Long] = None): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir")
    val v = version
      .orElse(asOfTimestamp.map(versionAsOf(spark, dir, _)))
      .getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in ${vs.mkString(",")} (vacuumed?)")
    // manifest-level pruning, twice over — both pure metadata operations
    // on the manifest, before Spark ever lists or opens a file:
    //  * partitionFilter drops files by `col=val` PATH segment;
    //  * skip=(col,lo,hi) drops files whose recorded min/max range
    //    (stats collected at append time) cannot intersect [lo,hi]; files
    //    without stats for that column are conservatively kept.
    val lines = manifestLines(spark, dir, v)
    val all = lines.filterNot(_.startsWith("#"))
    val stats = fileStats(lines)
    val afterPart = partitionFilter.foldLeft(all) { case (fs0, (c, value)) =>
      fs0.filter(inPartition(_, c, value))
    }
    // `#stats=` lines are keyed by ON-DISK column names; accept the
    // logical name post-rename
    val skipL2p = metaSchema(lines).map(renameMap).getOrElse(Map.empty)
    val files = skip.fold(afterPart) { case (c0, lo, hi) =>
      val c = skipL2p.getOrElse(c0, c0)
      afterPart.filter(f => stats.get(f).flatMap(_.get(c)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      })
    }
    require(all.nonEmpty, s"version $v has an empty manifest")
    // mergeSchema: additive schema evolution — a snapshot may span commits
    // written before and after a column was added; rows from old files
    // surface the new column as null (Delta's mergeSchema semantics).
    // basePath re-derives hive-style partition columns from file paths.
    val dvs = dvFiles(lines)
    // when ALTER metadata exists, read with the DECLARED physical schema
    // instead of mergeSchema: a widened column's int32-era and int64-era
    // files cannot schema-merge, but every parquet reader can serve the
    // declared wide type per file; hive partition columns still append
    // via basePath inference, dropped physical columns are simply not
    // requested, and added columns null-fill (same semantics as before)
    val declared = metaSchema(lines).map(physicalSchema)
    def scan(fl: Seq[String]) = { // fl: manifest-RELATIVE names
      // dv-free tables take the plain scan — zero plan overhead; with dvs
      // the lineage-tagged anti-join hides deleted rows (merge-on-read)
      if (dvs.isEmpty) {
        val r0 = spark.read.option("basePath", dir)
        // footer-derived schema when no ALTER metadata declares one:
        // planning stays job-free (see footerMergedSchema)
        declared.orElse(
            footerMergedSchema(spark, dir, commitReps(fl), strict = true))
          .fold(r0.option("mergeSchema", "true"))(r0.schema)
          .parquet(fl.map(f => s"$dir/$f"): _*)
      } else applyDv(spark, dir, lineageScan(spark, dir, fl, declared), dvs)
        .drop("_dv_file", "_dv_idx")
    }
    // a filter matching zero files is a legitimate empty partition/range,
    // not an error: return an empty frame with the snapshot's schema —
    // derived from ONE representative file per directory (mergeSchema
    // over all N files would read every footer just to plan empty)
    val out =
      if (files.nonEmpty) scan(files)
      else {
        val reps = all.groupBy(f => f.take(f.lastIndexOf('/') + 1))
          .values.map(_.head).toSeq
        scan(reps)
          .where(org.apache.spark.sql.functions.lit(false))
      }
    val eqApplied = applyEqDeletes(spark, dir, out, lines)
    // hidden-partitioning layout columns stay hidden on this path too
    val unhidden =
      layoutTransforms(lines).foldLeft(eqApplied)((d, t) => d.drop(t.dirCol))
    // column mapping: surface the logical schema (renames, drops, adds)
    toLogical(unhidden, metaSchema(lines), passthrough = pathPartCols(all))
  }

  /** Snapshot read through [[graft.sources.TableLogFileIndex]] — the
    * AUTO-pruning twin of [[read]]: no `skip=`/`partitionFilter=`
    * arguments; Spark's planner hands the query's own WHERE conjuncts to
    * the index, which answers partition pruning (hive path segments) and
    * min/max data skipping (`#stats=` lines) from the manifest alone.
    * Deletion vectors apply as in [[read]]. Prefer this entry point for
    * analytical reads; [[read]] remains for callers that pin file subsets
    * programmatically.
    */
  /** Assemble the snapshot's manifest-backed [[graft.sources.TableLogFileIndex]]
    * + flat data schema + raw manifest lines — the planning state shared
    * by [[table]] and the DSv2 catalog front door
    * ([[graft.sources.GraftCatalog]]).
    */
  private[graft] def snapshotIndex(spark: SparkSession, dir: String,
                                   version: Option[Long],
                                   asOfTimestamp: Option[Long])
      : (graft.sources.TableLogFileIndex,
         org.apache.spark.sql.types.StructType, Seq[String]) = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir")
    val v = version
      .orElse(asOfTimestamp.map(versionAsOf(spark, dir, _)))
      .getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in ${vs.mkString(",")} (vacuumed?)")
    val lines = manifestLines(spark, dir, v)
    val all = lines.filterNot(_.startsWith("#"))
    require(all.nonEmpty, s"version $v has an empty manifest")
    val fs = fsOf(spark, dir)
    val qd = qualifiedDir(spark, dir)
    // file sizes/mtimes via ONE listStatus per distinct parent directory
    // (a per-file getFileStatus was 480 RPCs on a days×bucket layout)
    val byDir = all.groupBy(f => f.take(f.lastIndexOf('/') + 1))
    val statusOf: Map[String, org.apache.hadoop.fs.FileStatus] =
      byDir.keys.flatMap { d =>
        val p = if (d.isEmpty) new Path(dir) else new Path(dir, d)
        fs.listStatus(p).toSeq
          .filter(_.isFile)
          .map(st => toRelative(spark, dir, st.getPath.toUri.toString) -> st)
      }.toMap
    val entries = all.map { rel =>
      val st = statusOf.getOrElse(rel, fs.getFileStatus(new Path(dir, rel)))
      (rel, st.getLen, st.getModificationTime)
    }
    val partSchema =
      if (all.head.contains("/"))
        graft.sources.TableLogFileIndex.inferPartitionSchema(all)
      else new org.apache.spark.sql.types.StructType()
    // data schema from one representative file per COMMIT (filename
    // prefix), not per directory: schema can only change at commit
    // granularity, and a days×bucket layout has hundreds of directories
    // per commit — reading a footer for each was the dominant cost of
    // opening a transform-partitioned table
    val reps = commitReps(all)
    // data schema from the representatives' FOOTERS, merged on the driver
    // ([[footerMergedSchema]]) — zero Spark jobs to open a table (footers
    // are cached per JVM, so re-resolving a table after a commit reads
    // exactly the new commit's footer). The distributed mergeSchema
    // inference remains only as the foreign-file fallback; its semantics
    // (CANNOT_MERGE_SCHEMAS at planning on un-arbitrated twins, lenient
    // widest-type merge when #schema= arbitrates) are preserved.
    val mergedSchema = footerMergedSchema(spark, dir, reps,
      strict = metaSchema(lines).isEmpty).getOrElse {
      try spark.read.option("mergeSchema", "true")
        .parquet(reps.map(f => s"$dir/$f"): _*).schema
      catch {
        case e: org.apache.spark.SparkException
            if e.getMessage.contains("CANNOT_MERGE_SCHEMAS") ||
              e.getMessage.contains("Failed merging schemas") =>
          lenientMerge(reps.map(f => spark.read.parquet(s"$dir/$f").schema),
            original = if (metaSchema(lines).isEmpty) Some(e) else None)
      }
    }
    val dataSchema = org.apache.spark.sql.types.StructType(
      mergedSchema.filterNot(f => partSchema.fieldNames.contains(f.name)))
    val transforms = layoutTransforms(lines)
    val index = new graft.sources.TableLogFileIndex(
      spark, qd, entries, fileStats(lines), partSchema, transforms)
    (index, dataSchema, lines)
  }

  def table(spark: SparkSession, dir: String,
            version: Option[Long] = None,
            asOfTimestamp: Option[Long] = None): DataFrame = {
    val (index, dataSchema, lines) =
      snapshotIndex(spark, dir, version, asOfTimestamp)
    val qd = qualifiedDir(spark, dir)
    val transforms = layoutTransforms(lines)
    val base = graft.sources.TableLogFileIndex.relation(spark, index, dataSchema)
    val dvs = dvFiles(lines)
    val withDv =
      if (dvs.isEmpty) base
      else {
        import org.apache.spark.sql.functions.substring_index
        val tagged = base
          .withColumn("_dv_file",
            substring_index(col("_metadata.file_path"), qd + "/", -1))
          .withColumn("_dv_idx", col("_metadata.row_index"))
        applyDv(spark, dir, tagged, dvs).drop("_dv_file", "_dv_idx")
      }
    val withEq = applyEqDeletes(spark, dir, withDv, lines)
    // HIDDEN partitioning: the derived layout columns never reach users
    val unhidden = transforms.foldLeft(withEq)((d, t) => d.drop(t.dirCol))
    // column mapping: logical projection (renames/drops/adds); Catalyst
    // pushes the aliases down, so pruning/pushdown still reach the scan
    val visParts = index.partitionSchema.fieldNames.toSeq
      .filterNot(transforms.map(_.dirCol).toSet)
    toLogical(unhidden, metaSchema(lines), passthrough = visParts)
  }

  /** OPTIMIZE: rewrite the CURRENT snapshot into ~targetBytes files and
    * commit the new layout as a new version. Old data files stay for time
    * travel until vacuumed. `clusterBy` range-partitions + sorts the
    * rewrite so each output file owns a disjoint key range, and `statsCol`
    * records fresh per-file min/max — together they make `read(skip=...)`
    * prune at the filter's selectivity (Delta's OPTIMIZE ZORDER role;
    * for genuine two-dimensional clustering see
    * [[Maintenance.compact]]'s `zorderBy` with the `graft_zorder` key).
    * Returns (filesBefore, filesAfter, newVersion).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              clusterBy: Seq[String] = Seq.empty,
              statsCol: Option[String] = None): (Int, Int, Long) = {
    val fs = fsOf(spark, dir)
    val tip = versions(spark, dir).last
    val current = readManifest(spark, dir, tip)
    require(current.forall(!_.contains("/")),
      "compact rewrites the table unpartitioned — for a partitioned table, " +
      "compact each partition's files separately (or overwrite with partitionBy)")
    val totalBytes = current.map(f => fs.getFileStatus(new Path(dir, f)).getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val snap = read(spark, dir, Some(tip))
    val arranged =
      if (clusterBy.isEmpty) snap.repartition(nFiles)
      else snap.repartitionByRange(nFiles, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    // replaceFiles carries over files appended by racing writers since the
    // snapshot read and ABORTS if a racing overwrite/compact removed any
    // of the snapshot's files (committing would resurrect deleted rows —
    // Delta aborts OPTIMIZE on conflicting overwrites the same way)
    // the rewrite reads through read() = dv-applied, so compaction
    // MATERIALIZES outstanding deletes; the vectors retire with it
    val (v, fresh) = replaceFiles(spark, dir, current.toSet, arranged,
      Seq.empty, statsCol, op = "compact", mkDv = _ => Seq.empty)
    (current.size, fresh.size, v)
  }

  /** OPTIMIZE one partition of a hive-partitioned table: rewrites only
    * that partition's files (a copy-on-write replace, like
    * [[deleteWhere]]), leaving every other partition's files untouched in
    * the new version — so maintenance parallelizes across partitions and
    * never rewrites cold data. Returns (filesBefore, filesAfter,
    * newVersion); version unchanged when the partition has ≤1 file.
    */
  def compactPartition(spark: SparkSession, dir: String,
                       partition: (String, String),
                       targetBytes: Long = 128L * 1024 * 1024,
                       statsCol: Option[String] = None): (Int, Int, Long) = {
    val fs = fsOf(spark, dir)
    val tip = versions(spark, dir).last
    val (c, value) = partition
    val affected = readManifest(spark, dir, tip)
      .filter(inPartition(_, c, value)).toSet
    if (affected.size <= 1) return (affected.size, affected.size, tip)
    val totalBytes = affected.toSeq
      .map(f => fs.getFileStatus(new Path(dir, f)).getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // the rewrite must reproduce the FULL hive layout, not just the
    // filtered column — partitioning by (market, et) and compacting on
    // et would otherwise flatten market out of the path and break every
    // later partitionFilter on it. The affected files' own path segments
    // carry the complete ordered column list.
    val partCols = affected.head.split('/').init.map(_.split('=')(0)).toSeq
    // basePath re-derives the partition columns, partitionBy re-lays out.
    // dv-applied: the partition rewrite materializes ITS deletes; dv
    // lines stay (other partitions may still need them — the rewritten
    // files' entries go inert with the rename).
    val tipLines = manifestLines(spark, dir, tip)
    val rows = applyDv(spark, dir,
        lineageScan(spark, dir, affected.toSeq,
          metaSchema(tipLines).map(physicalSchema)),
        dvFiles(tipLines))
      .drop("_dv_file", "_dv_idx")
      .repartition(nFiles)
    val (v, fresh) = replaceFiles(spark, dir, affected, rows, partCols,
      statsCol, op = "compact")
    (affected.size, fresh.size, v)
  }

  /** Entries across the tip's POSITIONAL deletion-vector sidecars — the
    * number the MoR read cap (`spark.graft.catalog.morMaxEntries`)
    * tests. Counted distributed (parquet row counts, no driver
    * materialization); includes entries gone inert because a rewrite
    * replaced their target file — [[compactDeletes]] retires those.
    */
  def dvEntryCount(spark: SparkSession, dir: String): Long = {
    val vs = versions(spark, dir)
    if (vs.isEmpty) return 0L
    val dvs = dvFiles(manifestLines(spark, dir, vs.last))
    if (dvs.isEmpty) 0L
    // row counts live in the sidecars' parquet footers — a driver-side
    // metadata read, where the old scan+count was two jobs
    else footerRowCount(spark, dvs.map(f => new Path(dir, f)))
  }

  /** OPTIMIZE for the deletion-vector SIDECARS: rewrite the tip's dv
    * entries keeping only those whose target data file is still in the
    * manifest. Partition-scoped rewrites ([[compactPartition]],
    * [[overwritePartitions]], copy-on-write deletes) materialize their
    * files' deletes but leave the sidecar lines — the dead entries cost
    * nothing semantically yet still count against the MoR read cap and
    * load into every executor's dv map. On a partitioned 100 TB table
    * the maintenance loop is: compact hot partitions (materializes their
    * deletes), then this (sidecar-sized, no data file touched) to shrink
    * the read-side dv state back to the LIVE delete count.
    *
    * Metadata-only commit: data file list unchanged; racing dv-deletes
    * compose (their fresh sidecar lines, unknown to this rewrite, carry
    * through — only the lines this rewrite READ are replaced). Returns
    * (entriesBefore, entriesAfter, version); version unchanged when the
    * tip has no dv lines.
    */
  def compactDeletes(spark: SparkSession, dir: String): (Long, Long, Long) = {
    // never-committed table: nothing to compact (mirror dvEntryCount's 0)
    val tip = versions(spark, dir).lastOption.getOrElse(return (0L, 0L, 0L))
    val lines = manifestLines(spark, dir, tip)
    val dvs = dvFiles(lines)
    if (dvs.isEmpty) return (0L, 0L, tip)
    val readLines = dvs.map(f => s"#dvp=$f").toSet
    val live = lines.filterNot(_.startsWith("#"))
    val entries = spark.read.schema(DvSidecarSchema)
      .parquet(dvs.map(f => s"$dir/$f"): _*)
      .select(col("_dv_file"), col("_dv_idx"))
    val before = footerRowCount(spark, dvs.map(f => new Path(dir, f)))
    // live-file filter as a join, not an isin literal: a million-file
    // manifest must not inline into the plan
    val liveDf = spark.createDataFrame(
      spark.sparkContext.parallelize(live.map(org.apache.spark.sql.Row(_)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_dv_file",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val surviving = entries.join(
      org.apache.spark.sql.functions.broadcast(liveDf), Seq("_dv_file"))
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val dvDir = s"$DvDir/$commitId-rewrite"
    surviving.write.parquet(s"$dir/$dvDir")
    val fs = fsOf(spark, dir)
    val written = fs.listStatus(new Path(dir, dvDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => s"$dvDir/${s.getPath.getName}")
    // count from the just-written footers (driver metadata, no job)
    val after = footerRowCount(spark, written.map(f => new Path(dir, f)))
    val fresh = if (after == 0) Seq.empty else written
    if (after == 0) fs.delete(new Path(dir, dvDir), true)
    val v = try {
      commit(spark, dir, identity[Seq[String]],
        mkDv = tipDv => tipDv.filterNot(readLines) ++
          fresh.map(f => s"#dvp=$f"),
        op = "compact_dv").get
    } catch {
      case e: java.util.ConcurrentModificationException =>
        fs.delete(new Path(dir, dvDir), true); throw e
    }
    (before, after, v)
  }

  /** `dir` as an absolute filesystem path — manifest-relative paths are
    * computed by stripping this, and a RELATIVE `dir` (scratch paths)
    * would make stripPrefix a silent no-op against the absolute paths
    * listings and `input_file_name` report.
    */
  private def qualifiedDir(spark: SparkSession, dir: String): String =
    fsOf(spark, dir).makeQualified(new Path(dir)).toUri.getPath

  /** Absolute scan path (as `input_file_name` reports it) → the
    * manifest's relative path.
    */
  private def toRelative(spark: SparkSession, dir: String, absUri: String): String = {
    val p = new Path(new java.net.URI(absUri)).toUri.getPath
    p.stripPrefix(qualifiedDir(spark, dir)).stripPrefix("/")
  }

  /** Copy-on-write DELETE: rewrite ONLY the data files that contain rows
    * matching `cond`; untouched files carry into the new version as-is —
    * at a million files, a selective delete rewrites the handful that
    * matter instead of the table. Old versions still see the deleted rows
    * (time travel). Concurrent appends are carried over; a concurrent
    * overwrite/compact of the affected files aborts (same conflict rule
    * as [[compact]]). Pass `partitionBy` for partitioned tables so
    * rewritten survivors keep their layout.
    * Returns (newVersion, filesRewritten) — version unchanged when
    * nothing matched.
    */
  def deleteWhere(spark: SparkSession, dir: String,
                  cond: org.apache.spark.sql.Column,
                  partitionBy: Seq[String] = Seq.empty): (Long, Int) = {
    val tip = versions(spark, dir).last
    val lines = manifestLines(spark, dir, tip)
    val dvs = dvFiles(lines)
    val all = lines.filterNot(_.startsWith("#"))
    val lineageCols = pathPartCols(all) ++ Seq("_dv_file", "_dv_idx")
    // visible snapshot with row lineage: `_dv_file` (not input_file_name,
    // which loses meaning after the dv anti-join) names each row's file;
    // LOGICAL names, so the caller's predicate resolves post-rename
    def visible(fl: Seq[String]) =
      toLogical(applyEqDeletes(spark, dir,
        applyDv(spark, dir, lineageScan(spark, dir, fl,
          metaSchema(lines).map(physicalSchema)), dvs), lines),
        metaSchema(lines), passthrough = lineageCols)
    val affected = visible(all).filter(cond)
      .select(col("_dv_file")).distinct()
      .collect().map(_.getString(0)).toSet
    if (affected.isEmpty) return (tip, 0)
    // three-valued logic: for a NULL-evaluating row, !cond is NULL and a
    // bare filter would DROP it — i.e. delete rows the predicate never
    // matched. Survivors = rows where cond is not definitely true —
    // computed over the dv-APPLIED view, so rewriting a file never
    // resurrects its previously dv-deleted rows.
    val survivors = visible(affected.toSeq)
      .filter(org.apache.spark.sql.functions.not(
        org.apache.spark.sql.functions.coalesce(
          cond, org.apache.spark.sql.functions.lit(false))))
      .drop("_dv_file", "_dv_idx")
    replaceFiles(spark, dir, affected, survivors, partitionBy,
      op = "delete",
      preGuard = serializableGuard(spark, all.toSet, "deleteWhere"))
      ._1 -> affected.size
  }

  /** Delta-style isolation dial for predicate deletes:
    * `spark.graft.commit.isolation` = `snapshot` (default) lets a
    * predicate DELETE commit alongside racing appends (write skew: rows
    * appended after the delete's read snapshot survive even if they
    * match the predicate — both commits land, Delta's
    * WriteSerializable); `serializable` ABORTS the delete when any file
    * joined the table after its snapshot — the racing append may hold
    * rows the predicate should have covered, so no serial order exists
    * and the caller must re-read and retry (Delta's
    * ConcurrentAppendException contract). Evaluated inside the commit
    * retry loop against the CURRENT tip.
    */
  // private[core]: the guard is unit-testable without orchestrating a
  // real race, like [[rebaseCompaction]]
  private[core] def serializableGuard(spark: SparkSession,
                                      snapFiles: Set[String], op: String)
      : Seq[String] => Unit =
    if (spark.conf.get("spark.graft.commit.isolation", "snapshot") != "serializable")
      _ => ()
    else base => {
      val added = base.filterNot(snapFiles)
      if (added.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"$op under serializable isolation lost to a concurrent commit " +
            s"that added file(s) ${added.take(3).mkString(", ")} ... " +
            "after this operation's read snapshot; re-read and retry")
    }

  /** Merge-on-read DELETE — deletion vectors instead of file rewrites:
    * matching rows are recorded as (file, row-index) entries in a parquet
    * sidecar under `_graft_dv/`, referenced by a `#dvp=` manifest line;
    * every data file carries into the new version UNTOUCHED. [[read]]
    * hides dv-listed rows with an anti-join; [[compact]] materializes the
    * deletes and clears the vectors.
    *
    * This is the Delta/Iceberg deletion-vector trade: a selective delete
    * on a 100 TB table touches kilobytes of sidecar instead of rewriting
    * every file that holds a matching row, at the price of a per-read
    * anti-join whose build side is the deleted-row count. Use
    * [[deleteWhere]] (copy-on-write) when deleting a large fraction;
    * [[compact]] (or any rewrite of the file) retires the entries.
    *
    * Conflict rule: aborts if a racing overwrite/compact removed any file
    * this delete's row-indexes were computed against (committing would
    * target rows that moved — same rule as [[compact]]). Racing APPENDS
    * and racing dv-deletes of OTHER rows compose fine: the commit retry
    * re-bases both the file list and the dv line set on the new tip.
    * Returns (newVersion, rowsDeleted); version unchanged when nothing
    * matched.
    */
  def deleteWhereDv(spark: SparkSession, dir: String,
                    cond: org.apache.spark.sql.Column): (Long, Long) = {
    val tip = versions(spark, dir).last
    val lines = manifestLines(spark, dir, tip)
    val all = lines.filterNot(_.startsWith("#"))
    val snapFiles = all.toSet
    val matches = toLogical(applyEqDeletes(spark, dir,
      applyDv(spark, dir, lineageScan(spark, dir, all,
        metaSchema(lines).map(physicalSchema)), dvFiles(lines)), lines),
      metaSchema(lines),
      passthrough = pathPartCols(all) ++ Seq("_dv_file", "_dv_idx"))
      .filter(org.apache.spark.sql.functions.coalesce(
        cond, org.apache.spark.sql.functions.lit(false)))
      .select(col("_dv_file"), col("_dv_idx"))
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val dvDir = s"$DvDir/$commitId"
    matches.write.parquet(s"$dir/$dvDir")
    val fs = fsOf(spark, dir)
    val freshDv = fs.listStatus(new Path(dir, dvDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => s"$dvDir/${s.getPath.getName}")
    // row count from the written sidecars' FOOTERS — driver metadata, no
    // job, no second evaluation of the predicate
    val nDeleted = footerRowCount(spark, freshDv.map(f => new Path(dir, f)))
    if (nDeleted == 0) {
      fs.delete(new Path(dir, dvDir), true)
      return (tip, 0L)
    }
    val guard = serializableGuard(spark, snapFiles, "deleteWhereDv")
    val v = try {
      commit(spark, dir,
        mkFiles = base => {
          if (!snapFiles.subsetOf(base.toSet))
            throw new java.util.ConcurrentModificationException(
              s"files under $dir were rewritten during deleteWhereDv; aborting")
          guard(base)
          base
        },
        mkDv = tipDv => tipDv ++ freshDv.map(f => s"#dvp=$f"),
        op = "delete_dv")
    } catch {
      case e: java.util.ConcurrentModificationException =>
        fs.delete(new Path(dir, dvDir), true) // orphan sidecar cleanup
        throw e
    }
    (v.get, nDeleted)
  }

  /** EQUALITY delete — Iceberg's second delete format, complementing the
    * positional deletion vectors: the predicate is a SET OF KEY VALUES
    * (`#dveq=<sidecar>|k1,k2` manifest lines, sidecar = parquet of the
    * key columns), and the delete commits WITHOUT READING A SINGLE DATA
    * FILE — no scan to locate row positions, no file rewrite. Readers
    * hide matching rows with an anti-join on the key columns.
    *
    * When to prefer which: a predicate delete over arbitrary columns
    * needs [[deleteWhereDv]] (it must scan anyway to evaluate the
    * predicate); a delete driven by an EXTERNAL key list — GDPR user ids,
    * upstream retractions, late dedup verdicts — is exactly this
    * operation, and at 100 TB "delete these 10k users" costs writing a
    * 10k-row sidecar, full stop. Keys are null-safe-compared; rows
    * appended LATER with a deleted key are deleted too (the Iceberg
    * equality-delete sequencing caveat, simplified to: the delete applies
    * to every snapshot from its commit on — retire it with [[compact]]).
    * Returns the committed version.
    */
  def deleteKeys(spark: SparkSession, dir: String, keys: DataFrame): Long = {
    require(versions(spark, dir).nonEmpty, s"no committed versions under $dir")
    // sidecars store PHYSICAL key names (stable across renames): readers
    // apply them to physical frames before the logical projection
    val l2p = metaSchema(manifestLines(spark, dir, versions(spark, dir).last))
      .map(renameMap).getOrElse(Map.empty)
    val physKeys =
      if (keys.columns.exists(l2p.contains))
        keys.select(keys.columns.toIndexedSeq.map(c =>
          keys(c).as(l2p.getOrElse(c, c))): _*)
      else keys
    val keyCols = physKeys.columns.toSeq
    require(keyCols.nonEmpty, "deleteKeys needs at least one key column")
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val eqDir = s"$DvDir/$commitId-eq"
    physKeys.distinct().write.parquet(s"$dir/$eqDir")
    val fs = fsOf(spark, dir)
    val fresh = fs.listStatus(new Path(dir, eqDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => s"$eqDir/${s.getPath.getName}")
    commit(spark, dir, identity[Seq[String]],
      mkDv = tipDv => tipDv ++
        fresh.map(f => s"#dveq=$f|${keyCols.mkString(",")}"),
      op = "delete_eq").get
  }

  /** Equality-delete lines: (sidecar rel path, key column names). */
  private[graft] def eqLines(lines: Seq[String]): Seq[(String, Seq[String])] =
    lines.filter(_.startsWith("#dveq=")).map { l =>
      val Array(f, cols) = l.stripPrefix("#dveq=").split("\\|", 2)
      (f, cols.split(',').toSeq)
    }

  /** Hide rows matching any equality-delete key set: one left_anti join
    * per distinct key-column tuple (sidecars sharing a tuple union into
    * one build side). Build sides are deleted-key-count sized.
    */
  private def applyEqDeletes(spark: SparkSession, dir: String,
                             df: DataFrame, lines: Seq[String]): DataFrame = {
    val groups = eqLines(lines).groupBy(_._2)
    groups.foldLeft(df) { case (acc, (cols, entries)) =>
      val files = entries.map(_._1)
      val r0 = spark.read
      // key sidecars are Spark-staged: schema from their footers, no
      // inference job (plain read only for foreign files)
      val keys = footerMergedSchema(spark, dir, files, strict = true)
        .fold(r0)(r0.schema)
        .parquet(files.map(f => s"$dir/$f"): _*)
      val cond = cols.map(c => acc(c) <=> keys(c)).reduce(_ && _)
      acc.join(keys, cond, "left_anti")
    }
  }

  /** MERGE/upsert by key: rows of `updates` replace same-keyed rows,
    * new keys append — in ONE commit, rewriting only the files that hold
    * a matched key (copy-on-write, like [[deleteWhere]]).
    */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
             keyCols: Seq[String],
             partitionBy: Seq[String] = Seq.empty): (Long, Int) = {
    enforceConstraints(spark, dir, updates) // only NEW rows can violate
    val tip = versions(spark, dir).last
    val lines = manifestLines(spark, dir, tip)
    val dvs = dvFiles(lines)
    val all = lines.filterNot(_.startsWith("#"))
    val lineageCols = pathPartCols(all) ++ Seq("_dv_file", "_dv_idx")
    // lineage (`_dv_file` from parquet _metadata) instead of
    // input_file_name: survives the dv anti-join AND the key semi-join;
    // LOGICAL names, so `updates`' key columns resolve post-rename
    def visible(fl: Seq[String]) =
      toLogical(applyEqDeletes(spark, dir,
        applyDv(spark, dir, lineageScan(spark, dir, fl,
          metaSchema(lines).map(physicalSchema)), dvs), lines),
        metaSchema(lines), passthrough = lineageCols)
    val affected = visible(all)
      .join(org.apache.spark.sql.functions.broadcast(
        updates.select(keyCols.map(col): _*).distinct()), keyCols, "left_semi")
      .select(col("_dv_file"))
      .distinct().collect().map(_.getString(0)).toSet
    // survivors come from the dv-APPLIED view of the rewritten files, so
    // a merge never resurrects rows a deletion vector already hid
    val survivors =
      if (affected.isEmpty) updates
      else visible(affected.toSeq)
        .drop("_dv_file", "_dv_idx")
        .join(updates.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
        .unionByName(updates, allowMissingColumns = true)
    replaceFiles(spark, dir, affected, survivors, partitionBy,
      op = "merge")._1 -> affected.size
  }

  /** Driver-side facts a SQL row-level write (UPDATE / MERGE / delta
    * DELETE) needs before its executors start writing: the tip's hive
    * partition columns (SQL row-level writes on hidden-partitioned
    * tables are rejected — computing transform directories inside a
    * DSv2 delta writer would duplicate the API path's layout logic),
    * the logical→physical rename map, the stats columns every earlier
    * commit recorded, and the snapshot file set the commit-time
    * conflict check re-validates.
    */
  private[graft] case class DeltaSpec(partCols: Seq[String],
                                      l2p: Map[String, String],
                                      statsCols: Seq[String],
                                      snapFiles: Set[String],
                                      snapDv: Set[String])

  /** `pinnedLines`: the manifest lines of the SNAPSHOT the row-level
    * scan read (the [[graft.sources]] GraftTable's lazy `lines`). The
    * spec MUST derive from that same snapshot, not a re-read tip: a
    * compaction committing between the scan's analysis and the write's
    * construction would otherwise pass the snapFiles.subsetOf(base)
    * conflict check while the dv entries target files already gone from
    * the manifest — the delete half of an UPDATE silently inert, the
    * inserted image duplicating the still-visible old row.
    */
  private[graft] def deltaWriteSpec(spark: SparkSession, dir: String,
                                    declaredPartCols: Seq[String],
                                    pinnedLines: Option[Seq[String]] = None)
      : DeltaSpec = {
    val lines = pinnedLines.getOrElse {
      val vs = versions(spark, dir)
      if (vs.isEmpty) Seq.empty else manifestLines(spark, dir, vs.last)
    }
    if (lines.isEmpty)
      return DeltaSpec(declaredPartCols, Map.empty, Seq.empty, Set.empty,
        Set.empty)
    val (partCols, transforms, statsCols) = tipLayout(lines)
    if (transforms.nonEmpty)
      throw new UnsupportedOperationException(
        s"table at $dir uses hidden-partitioning transforms; SQL UPDATE/" +
          "MERGE cannot derive layout directories — use the API path " +
          "(TableLog.upsert / deleteWhereDv)")
    DeltaSpec(partCols,
      metaSchema(lines).map(renameMap).getOrElse(Map.empty),
      statsCols, lines.filterNot(_.startsWith("#")).toSet,
      dvLines(lines).toSet)
  }

  /** Commit a ROW-LEVEL DELTA — the merge-on-read twin of [[upsert]],
    * fed by executor-written files instead of a driver-staged frame:
    * `added` are freshly written data files (already in their final
    * hive-layout places under `dir`), `dvSidecars` are freshly written
    * positional delete sidecars (rows of `_dv_file`/`_dv_idx`, the
    * [[deleteWhereDv]] format). One atomic commit appends both — no
    * data file is rewritten, which is what lets a SQL MERGE on a 100 TB
    * table cost (changed rows) instead of (files holding changed rows).
    *
    * Conflict rules match [[deleteWhereDv]]: aborts (cleaning up the
    * staged files) if a racing rewrite removed any file of the snapshot
    * the row positions were computed against; racing appends compose
    * under the default snapshot isolation and abort this commit under
    * `spark.graft.commit.isolation=serializable`. CHECK constraints run
    * against the added rows before the commit, as on every write path.
    */
  private[graft] def commitDelta(spark: SparkSession, dir: String,
                                 added: Seq[String], dvSidecars: Seq[String],
                                 snapFiles: Set[String], op: String,
                                 statsCols: Seq[String],
                                 snapDv: Set[String] = Set.empty): Long = {
    val fs = fsOf(spark, dir)
    def cleanup(): Unit = {
      (added ++ dvSidecars).foreach(f =>
        try fs.delete(new Path(dir, f), false)
        catch { case _: java.io.IOException => () })
    }
    val vs = versions(spark, dir)
    if (added.isEmpty && dvSidecars.isEmpty)
      return vs.lastOption.getOrElse(0L)
    if (added.nonEmpty) {
      val checks = constraints(spark, dir)
      if (checks.nonEmpty) {
        val staged = toLogical(
          spark.read.option("basePath", dir)
            .parquet(added.map(f => s"$dir/$f"): _*),
          vs.lastOption.map(v => metaSchema(manifestLines(spark, dir, v)))
            .flatten)
        val bad = violations(staged, checks)
        if (bad.nonEmpty) {
          cleanup()
          throw new IllegalStateException(
            s"write to $dir rejected: CHECK constraint(s) violated: " +
              bad.mkString(", "))
        }
      }
    }
    val stats =
      if (added.isEmpty) Map.empty[String, Map[String, (Long, Long)]]
      else collectStats(spark, dir, added, statsCols)
    val guard = serializableGuard(spark, snapFiles, op)
    val serializable = spark.conf
      .get("spark.graft.commit.isolation", "snapshot") == "serializable"
    try {
      commit(spark, dir,
        mkFiles = base => {
          if (!snapFiles.subsetOf(base.toSet))
            throw new java.util.ConcurrentModificationException(
              s"files under $dir were rewritten during $op; aborting")
          guard(base)
          base ++ added
        },
        freshStats = stats,
        mkDv = tipDv => {
          // Under serializable, a MERGE/UPDATE must also lose to a racing
          // dv/eq DELETE of the same snapshot: the two compose under
          // snapshot isolation, but the update's re-inserted image would
          // resurrect a row the concurrent delete hid — no serial order
          // exists (Iceberg's validateNoConflictingDeleteFiles for
          // RowDelta). serializableGuard only sees DATA files, so the
          // sidecar-line drift is checked here.
          if (serializable && tipDv.toSet != snapDv)
            throw new java.util.ConcurrentModificationException(
              s"$op under serializable isolation lost to a concurrent " +
                s"delete commit that changed the dv/eq sidecar set under " +
                s"$dir after this operation's read snapshot; re-read and retry")
          tipDv ++ dvSidecars.map(f => s"#dvp=$f")
        },
        op = op).get
    } catch {
      case e: java.util.ConcurrentModificationException =>
        cleanup(); throw e
    }
  }

  /** Shared copy-on-write tail (also [[compact]]'s): stage `replacement`
    * rows, commit a manifest = fresh files + (base minus `replaced`),
    * aborting — with staged-file cleanup — if a racing overwrite already
    * removed any replaced file. Returns (version, fresh file names).
    */
  private def replaceFiles(spark: SparkSession, dir: String,
                           replaced: Set[String], replacement: DataFrame,
                           partitionBy: Seq[String],
                           statsCol: Option[String] = None,
                           op: String = "write",
                           mkDv: Seq[String] => Seq[String] = identity,
                           // extra per-retry commit check (isolation
                           // guards), run against the CURRENT tip's base
                           preGuard: Seq[String] => Unit = _ => ())
      : (Long, Seq[String]) = {
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val fresh = writeDataFiles(spark, dir, replacement, commitId, partitionBy)
    val stats = collectStats(spark, dir, fresh, statsCol.toSeq)
    val v = try {
      commit(spark, dir,
        base => { preGuard(base); rebaseCompaction(dir, replaced, fresh, op)(base) },
        freshStats = stats, op = op, mkDv = mkDv).get
    } catch {
      case e: java.util.ConcurrentModificationException =>
        val fs = fsOf(spark, dir)
        fresh.foreach(f => fs.delete(new Path(dir, f), false))
        throw e
    }
    (v, fresh)
  }

  /** The rewrite commits' LOGICAL conflict guard (copy-on-write
    * delete/upsert/compact all funnel through [[replaceFiles]] into
    * here): re-evaluated inside the commit retry loop against the
    * CURRENT tip, so a loser of the version CAS re-bases — and if any
    * file this operation decided to rewrite was itself rewritten or
    * removed by the race winner, the operation ABORTS with
    * `ConcurrentModificationException` instead of committing survivors
    * computed from a stale snapshot (the silent-lost-rewrite case; the
    * caller re-reads and re-runs the whole operation, Delta's
    * ConcurrentDeleteReadException contract). Disjoint-file rewrites
    * re-base cleanly and both commit. Package-private so the guard is
    * unit-testable without orchestrating a real race.
    */
  private[core] def rebaseCompaction(dir: String, compactedSet: Set[String],
                                     fresh: Seq[String], op: String = "compact")
                                    (base: Seq[String]): Seq[String] = {
    if (!compactedSet.subsetOf(base.toSet))
      throw new java.util.ConcurrentModificationException(
        s"$op on $dir lost a race: a concurrent commit rewrote file(s) " +
          s"this $op read (${compactedSet.diff(base.toSet).take(3).mkString(", ")}" +
          " ...); re-read and retry the operation")
    fresh ++ base.filterNot(compactedSet)
  }

  /** Drop manifests older than the newest `keepVersions` and delete data
    * files no retained manifest references (orphans from crashed commits
    * included). The retention floor is the time-travel horizon.
    *
    * Unreferenced files younger than `retainMs` are kept: an in-flight
    * writer moves its data files into the table dir BEFORE its manifest
    * exists, so without an age guard vacuum would reclaim the data of any
    * commit it races (the writer then commits a manifest pointing at
    * deleted files). Same guard for `.stage-*` dirs. The default is an
    * hour — far beyond any single commit's write window; pass 0 only when
    * no writer can be live (tests, maintenance windows).
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 1,
             retainMs: Long = 60L * 60 * 1000): Unit = {
    val fs = fsOf(spark, dir)
    val cutoff = System.currentTimeMillis() - math.max(0L, retainMs)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - math.max(1, keepVersions)))
    // The retention floor must be self-contained: if it's a delta commit,
    // materialize its resolved snapshot as a full checkpoint manifest
    // FIRST (before any older log file is deleted — resolution reads
    // through them), restoring the original commit mtime so `TIMESTAMP AS
    // OF` resolution is unchanged. A concurrent vacuum losing the
    // create-no-overwrite race just skips — the winner owns the swap.
    keep.headOption.foreach { floor =>
      val mp = manifestPath(dir, floor)
      val dp = deltaPath(dir, floor)
      if (!fs.exists(mp)) {
        val mtime = fs.getFileStatus(dp).getModificationTime
        val lines = manifestLines(spark, dir, floor)
        atomicPutIfAbsent(fs, mp,
          (lines.mkString("\n") + "\n").getBytes("UTF-8"))
        // fall through: the swap's tail (mtime assert + delta delete) runs
        // below whether THIS vacuum won the put, a concurrent one did, or
        // a previous vacuum crashed between put and setTimes/delete —
        // making the materialization idempotent across crashes
      }
      if (fs.exists(mp) && fs.exists(dp)) {
        // re-assert the original commit time from the delta (a crash after
        // the put but before setTimes would otherwise shift TIMESTAMP AS
        // OF for the floor), then retire the delta
        try fs.setTimes(mp, fs.getFileStatus(dp).getModificationTime, -1)
        catch { case _: java.io.IOException => () }
        fs.delete(dp, false)
      }
    }
    val referenced = keep.flatMap(readManifest(spark, dir, _)).toSet
    drop.foreach { v =>
      fs.delete(manifestPath(dir, v), false)
      fs.delete(deltaPath(dir, v), false)
      // a vacuumed version's change window is refused anyway (retention
      // guard in [[changes]]) — its materialized sidecar goes with it
      fs.delete(changeDataVersionDir(dir, v), true)
    }
    // recursive walk so files inside partition subdirs are reclaimed too;
    // matching is on the manifest's RELATIVE path (qualified base — an
    // unqualified relative dir would make stripPrefix a no-op, nothing
    // would match `referenced`, and vacuum would delete LIVE files). Any
    // path with a dot/underscore segment (_graft_log, .stage-*, markers)
    // is off-limits.
    val dirUri = qualifiedDir(spark, dir)
    val it = fs.listFiles(new Path(dir), true)
    val stale = scala.collection.mutable.ListBuffer.empty[Path]
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath.stripPrefix(dirUri).stripPrefix("/")
      val protectedPath = rel.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (s.isFile && !protectedPath && s.getModificationTime < cutoff
        && !referenced.contains(rel)) stale += s.getPath
    }
    stale.foreach(fs.delete(_, false))
    // stale staging dirs from crashed writers
    fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".stage-")
        && s.getModificationTime < cutoff)
      .foreach(s => fs.delete(s.getPath, true))
    // manifest temp files leaked by commits killed mid-link
    val log = new Path(dir, LogDir)
    if (fs.exists(log))
      fs.listStatus(log).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith(".tmp-")
          && s.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, false))
    // deletion-vector sidecars no retained manifest references (from
    // vacuumed delete_dv versions, compactions that materialized them, or
    // crashed deletes) — same age guard as data files, since a dv commit
    // writes its sidecar BEFORE its manifest exists
    val dvRoot = new Path(dir, DvDir)
    if (fs.exists(dvRoot)) {
      val referencedDv = keep.flatMap { v =>
        val ls = manifestLines(spark, dir, v)
        dvFiles(ls) ++ eqLines(ls).map(_._1)
      }.toSet
      val dvIt = fs.listFiles(dvRoot, true)
      val staleDv = scala.collection.mutable.ListBuffer.empty[Path]
      while (dvIt.hasNext) {
        val s = dvIt.next()
        val rel = s.getPath.toUri.getPath.stripPrefix(dirUri).stripPrefix("/")
        if (s.isFile && s.getModificationTime < cutoff
          && !referencedDv.contains(rel)) staleDv += s.getPath
      }
      staleDv.foreach(fs.delete(_, false))
    }
  }

  /** Roll the table back to `version` — Delta's `RESTORE TABLE ... TO
    * VERSION AS OF`: commits a NEW version whose manifest is the target
    * version's file set (stats included), so the rollback is itself
    * time-travelable and never moves a byte of data. Requires the target
    * manifest to still be retained (not vacuumed). Like [[overwrite]], a
    * restore discards concurrent appends racing it — rollback semantics.
    */
  def restore(spark: SparkSession, dir: String, version: Long): Long = {
    val vs = versions(spark, dir)
    require(vs.contains(version),
      s"version $version not in ${vs.mkString(",")} (vacuumed?)")
    val target = manifestLines(spark, dir, version)
    val files = target.filterNot(_.startsWith("#"))
    // stats AND deletion vectors come from the TARGET manifest, not the
    // tip: restoring re-instates exactly the target's visible row set
    commit(spark, dir, _ => files, freshStats = fileStats(target),
      op = s"restore($version)", mkDv = _ => dvLines(target)).get
  }

  /** The table's commit history, newest first — `DESCRIBE HISTORY`:
    * one row per retained version with its operation (`#op=` manifest
    * metadata; pre-op manifests read as "write") and file count. A pure
    * metadata read: manifests only, no data files touched.
    */
  /** Log-derived CHANGE FEED over a version window — the Delta CDF role
    * for this table format (reference consumers: the SCD2 dimension
    * maintenance in src/utils/scd_type2.py wants exactly "what changed
    * since version N" to drive downstream incremental gold): one row per
    * changed row for every data-change commit in `(fromVersion,
    * toVersion]`, stamped `_change_type` ∈ {insert, delete,
    * update_preimage, update_postimage} and `_commit_version`.
    *
    * Per commit the feed is reconstructed from the manifest delta alone:
    *  - POST-images = rows of the commit's ADDED files (as written);
    *  - PRE-images  = rows of REMOVED files that were visible at v-1
    *    (copy-on-write rewrites) + rows the commit's NEW dv entries hide
    *    (row-level UPDATE/MERGE/delete_dv — read from the dv-touched
    *    files only, never a full scan) + rows matching NEW eq-delete keys.
    *  - `keys` (the business key) pairs them: keys present on both sides
    *    become update_preimage/update_postimage, pre-only rows are
    *    deletes, post-only rows are inserts — full CDF fidelity for SQL
    *    UPDATE and MERGE INTO commits. On REWRITE commits (files
    *    removed), keyed pairs whose row is IDENTICAL on both sides (a
    *    copy-on-write rewrite carries every row of the rewritten file,
    *    changed or not) are SUPPRESSED, matching Delta CDF's
    *    only-actually-changed-rows contract — an SCD2 consumer sees no
    *    spurious history versions; delta (dv) commits carry exactly the
    *    rows the command touched and skip the compare. Without `keys` a
    *    delta commit
    *    degrades to pre→update_preimage / post→update_postimage for ALL
    *    carried rows, unchanged ones included (a pure UPDATE is exactly
    *    that; pass the key for exact, no-op-suppressed classification).
    *  - Rewrites that change NO logical rows (compact / compact_dv /
    *    alter / analyze) emit nothing — Delta's dataChange=false rule.
    *
    * SCALE: cost is O(changed data) per commit — added files, removed
    * files, and dv-TOUCHED files are read; untouched data never is. The
    * dv-entry and eq-key join build sides are changed-row-count sized
    * (broadcastable); the key-pairing joins carry only the commit's own
    * change set. One exception: an EQUALITY-delete commit's pre-images
    * must probe the v-1 snapshot for the deleted keys (eq sidecars carry
    * keys, not file positions), so such a commit costs one semi-join
    * filtered scan of the table at v-1 — O(table), like Iceberg's eq-
    * delete read amplification; dv/CoW commits stay O(changed). At 100 TB
    * an incremental consumer pays for its deltas, not the table.
    *
    * WIDE WINDOWS: insert-only commits are batched into ONE scan per
    * `#schema=` era (rows version-stamped via a broadcast file→version
    * join), so a months-long append window plans as a handful of nodes,
    * not one union branch per commit; only genuine DML commits add
    * per-commit branches. Windows reaching below the earliest RETAINED
    * version (vacuumed) are refused up front with retention advice —
    * within retention, every pre-image file is still referenced by a
    * retained manifest and therefore still on disk.
    */
  def changes(spark: SparkSession, dir: String,
              fromVersion: Long, toVersion: Long,
              keys: Seq[String] = Seq.empty): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir")
    require(fromVersion >= 0 && toVersion <= vs.last &&
      fromVersion <= toVersion,
      s"invalid change window ($fromVersion, $toVersion] for tip ${vs.last}")
    // VACUUM contract (Delta parity): the feed reads pre-images from
    // files referenced by the WINDOW'S OWN manifests, and [[vacuum]]
    // keeps data files and dv/eq sidecars alive exactly as long as a
    // retained manifest references them — so the window is servable iff
    // every manifest in [fromVersion, toVersion] is retained. Refuse a
    // vacuumed window UP FRONT with retention advice instead of dying
    // with a mid-query FileNotFoundException on a reclaimed pre-image.
    val floor = vs.head
    require(fromVersion >= floor || (floor == 1 && fromVersion == 0),
      s"change window ($fromVersion, $toVersion] reaches below the " +
        s"earliest retained version $floor of $dir (older versions were " +
        s"vacuumed, and their pre-image files may be reclaimed). Start " +
        s"from fromVersion >= $floor, or raise vacuum's keepVersions " +
        "above the consumer's replay horizon.")
    // One driver pass over the window classifies each data-change commit:
    // INSERT-ONLY commits (plain appends — the dominant shape of a long
    // CDC window on a hot table) are BATCHED, everything else (rewrites,
    // dv/eq deletes, restores) goes through the exact per-commit path.
    // The snapshot cache makes each manifestLines call incremental off
    // its predecessor, so the pass is O(window's delta lines) on the
    // driver, not O(versions × manifest size).
    val window = ((fromVersion + 1) to toVersion).flatMap { v =>
      val op = opOf(spark, dir, v)
      if (isNoChangeOp(op)) None else Some((v, op))
    }
    // materialized sidecars servable for THIS read: version -> part files.
    // One fs listing; a sidecar only substitutes for reconstruction when
    // the requested key matches the key it was classified under.
    val materialized = materializedChangeVersions(spark, dir)
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // insert-only commits grouped by their #schema= line: one scan per
    // schema ERA (not per commit), version-stamped per file — a
    // 1000-append window plans as ~1 scan + 1 broadcast join instead of
    // 1000 union branches
    val pending = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    var pendingLines: Seq[String] = Seq.empty
    def flush(): Unit = if (pending.nonEmpty) {
      frames ++= insertBatch(spark, dir, pending.toSeq, pendingLines)
      pending.clear()
    }
    // materialized DML commits grouped the same way: a run of consecutive
    // sidecar-served commits in one schema era is ONE basePath scan
    // (`_commit_version` re-derived as a hive partition column) — a year
    // of daily MERGEs plans as one scan, not 365 reconstruction branches
    val pendingMat = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var pendingMatLines: Seq[String] = Seq.empty
    def flushMat(): Unit = if (pendingMat.nonEmpty) {
      val files = pendingMat.toSeq.flatten
      if (files.nonEmpty)
        frames += readFiles(spark, dir, files,
          basePath = Some(s"$dir/$ChangeDataDir"))
          .withColumn("_commit_version", col("_commit_version").cast("long"))
      pendingMat.clear()
    }
    window.foreach { case (v, op) =>
      val cur = manifestLines(spark, dir, v)
      val prev = if (v <= 1) Seq.empty else manifestLines(spark, dir, v - 1)
      val curFiles = cur.filterNot(_.startsWith("#"))
      val prevFiles = prev.filterNot(_.startsWith("#"))
      val added = curFiles.filterNot(prevFiles.toSet)
      val removed = prevFiles.filterNot(curFiles.toSet)
      val newDv = dvFiles(cur).filterNot(dvFiles(prev).toSet)
      val newEq = eqLines(cur).filterNot(eqLines(prev).toSet)
      // batchable = pure insert: nothing removed/hidden, and no STANDING
      // eq-delete lines that could conditionally hide appended rows
      val batchable = removed.isEmpty && newDv.isEmpty && newEq.isEmpty &&
        eqLines(cur).isEmpty && added.nonEmpty
      // sidecar-served: materialized at commit time UNDER THE SAME KEY
      // the caller is asking for (the classification is key-dependent)
      val props = metaProps(cur)
      val sidecar = !batchable && materialized.contains(v) &&
        cdfEnabled(props) && keys == cdfKeys(props)
      if (batchable) {
        flushMat()
        val sl = cur.find(_.startsWith("#schema="))
        if (pending.nonEmpty &&
          sl != pendingLines.find(_.startsWith("#schema="))) flush()
        pendingLines = cur
        pending += ((v, added))
      } else if (sidecar) {
        flush()
        val sl = cur.find(_.startsWith("#schema="))
        if (pendingMat.nonEmpty &&
          sl != pendingMatLines.find(_.startsWith("#schema="))) flushMat()
        pendingMatLines = cur
        pendingMat += materialized(v)
      } else {
        flush(); flushMat()
        changeRowsOf(spark, dir, v, op, prev, cur, keys).foreach(frames += _)
      }
    }
    flush(); flushMat()
    if (frames.isEmpty) {
      // typed empty frame: logical tip schema + the two feed columns
      val s = logicalSchema(spark, dir)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(s.fields ++ Seq(
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType))))
    } else frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** EXACT op tokens (argument list stripped: "restore(3)" -> "restore")
    * that never change logical rows — prefix matching would silently
    * skip a future data-changing op that merely shares a prefix (e.g. a
    * hypothetical "alter_x" rewriting rows).
    */
  private val NoChangeOps = Set("compact", "compact_dv", "alter", "analyze",
    "create", "add_constraint")

  private[graft] def isNoChangeOp(op: String): Boolean =
    NoChangeOps.contains(op.takeWhile(_ != '('))

  /** The `#op=` token version `v` was committed with ("write" pre-op). */
  private[graft] def opOf(spark: SparkSession, dir: String, v: Long): String =
    versionMeta(spark, dir, v).find(_.startsWith("#op="))
      .map(_.stripPrefix("#op=")).getOrElse("write")

  private def changeDataVersionDir(dir: String, v: Long): Path =
    new Path(new Path(dir, ChangeDataDir), s"_commit_version=$v")

  /** Versions with a COMPLETE materialized change sidecar (a `_SUCCESS`
    * marker — a crash mid-write leaves no marker and the version falls
    * back to reconstruction), mapped to their part files' table-relative
    * paths. One recursive listing of `_change_data/`, driver-cheap:
    * sidecar volume is changed-row sized by construction.
    */
  private[graft] def materializedChangeVersions(
      spark: SparkSession, dir: String): Map[Long, Seq[String]] = {
    val fs = fsOf(spark, dir)
    val root = new Path(dir, ChangeDataDir)
    if (!fs.exists(root)) Map.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("_commit_version="))
      .flatMap { s =>
        val v = s.getPath.getName.stripPrefix("_commit_version=").toLong
        if (!fs.exists(new Path(s.getPath, "_SUCCESS"))) None
        else Some(v -> fs.listStatus(s.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(f => s"$ChangeDataDir/_commit_version=$v/${f.getPath.getName}"))
      }.toMap
  }

  /** One commit's typed change rows, reconstructed from the log — the
    * per-version unit [[changes]] batches over, exposed for the DSv2
    * change-feed stream's spool path ([[graft.sources]]). None when the
    * commit changed no logical rows.
    */
  private[graft] def changesOfVersion(spark: SparkSession, dir: String,
                                      v: Long, keys: Seq[String])
      : Option[DataFrame] = {
    val cur = manifestLines(spark, dir, v)
    val prev = if (v <= 1) Seq.empty else manifestLines(spark, dir, v - 1)
    changeRowsOf(spark, dir, v, opOf(spark, dir, v), prev, cur, keys)
  }

  /** Commit-time change-data materialization (the Delta `_change_data`
    * writer role): when the committed snapshot's `#tblprop=` carries
    * [[CdfProp]] and the commit is a genuine non-insert data change, the
    * typed change rows are reconstructed ONCE — while the commit's pre
    * and post file sets are both guaranteed retained — and written under
    * [[ChangeDataDir]], hive-partitioned by `_commit_version`. Readers
    * ([[changes]] and the streaming change feed) then serve the window
    * with one scan per schema era, never re-deriving the same commit
    * twice. Pure inserts are skipped: stamping added files is already
    * O(1)-per-era via [[insertBatch]], so a sidecar would only duplicate
    * the inserted bytes. A crash between the commit and the `_SUCCESS`
    * marker is safe: the incomplete sidecar is invisible (no marker) and
    * the version reconstructs on read like any unmaterialized commit.
    */
  private def maybeMaterializeChanges(spark: SparkSession, dir: String,
                                      v: Long, op: String,
                                      prev: Seq[String],
                                      cur: Seq[String]): Unit = {
    val props = metaProps(cur)
    if (!cdfEnabled(props) || isNoChangeOp(op)) return
    val curFiles = cur.filterNot(_.startsWith("#"))
    val prevFiles = prev.filterNot(_.startsWith("#"))
    val added = curFiles.filterNot(prevFiles.toSet)
    val removed = prevFiles.filterNot(curFiles.toSet)
    val newDv = dvFiles(cur).filterNot(dvFiles(prev).toSet)
    val newEq = eqLines(cur).filterNot(eqLines(prev).toSet)
    val pureInsert = removed.isEmpty && newDv.isEmpty && newEq.isEmpty &&
      eqLines(cur).isEmpty
    if (pureInsert) return
    val fs = fsOf(spark, dir)
    val target = changeDataVersionDir(dir, v)
    if (fs.exists(new Path(target, "_SUCCESS"))) return // idempotent
    changeRowsOf(spark, dir, v, op, prev, cur, cdfKeys(props)).foreach { df =>
      // _commit_version lives in the directory name; a reader re-derives
      // it as a partition column (and the empty-change case writes just
      // the marker — zero part files, zero rows served)
      df.drop("_commit_version").write.mode("overwrite")
        .parquet(target.toString)
    }
    if (!fs.exists(new Path(target, "_SUCCESS"))) {
      fs.mkdirs(target)
      fs.create(new Path(target, "_SUCCESS"), true).close()
    }
  }

  /** One scan for a group of INSERT-ONLY commits sharing a `#schema=`
    * line: all their added files in a single mergeSchema read, each row
    * stamped with its commit's version through a broadcast file→version
    * join — O(1) plan nodes per schema era instead of one union branch
    * (and one DataSource resolution) per commit. Falls back to the
    * per-commit shape if the cross-commit footer merge refuses (drifting
    * file schemas on a never-altered table).
    */
  private def insertBatch(spark: SparkSession, dir: String,
                          group: Seq[(Long, Seq[String])],
                          lines: Seq[String]): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{broadcast, substring_index}
    val files = group.flatMap(_._2)
    if (files.isEmpty) None
    else {
      val ms = metaSchema(lines)
      val partCols = pathPartCols(files)
      def perCommit: DataFrame = group.map { case (v, fl) =>
        toLogical(readFiles(spark, dir, fl), ms, passthrough = partCols)
          .withColumn("_commit_version", lit(v))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      val stamped =
        if (group.size == 1) perCommit
        else try {
          import spark.implicits._
          val qd = qualifiedDir(spark, dir)
          val fileVer = group
            .flatMap { case (v, fl) => fl.map(f => (f, v)) }
            .toDF("_chg_file", "_commit_version")
          val tagged = readFiles(spark, dir, files)
            .withColumn("_chg_file",
              substring_index(col("_metadata.file_path"), qd + "/", -1))
          toLogical(tagged.join(broadcast(fileVer), Seq("_chg_file")),
            ms, passthrough = partCols :+ "_commit_version")
            .drop("_chg_file")
        } catch { case scala.util.control.NonFatal(_) => perCommit }
      Some(stamped.withColumn("_change_type", lit("insert")))
    }
  }

  /** One commit's change rows (None when it changed nothing). */
  private def changeRowsOf(spark: SparkSession, dir: String, v: Long,
                           op: String, prev: Seq[String], cur: Seq[String],
                           keys: Seq[String]): Option[DataFrame] = {
    val curFiles = cur.filterNot(_.startsWith("#"))
    val prevFiles = prev.filterNot(_.startsWith("#"))
    val addedFiles = curFiles.filterNot(prevFiles.toSet)
    val removedFiles = prevFiles.filterNot(curFiles.toSet)
    val prevDv = dvFiles(prev)
    val newDvSidecars = dvFiles(cur).filterNot(prevDv.toSet)
    val newEq = eqLines(cur).filterNot(eqLines(prev).toSet)
    val ms = metaSchema(cur)
    val partCols = pathPartCols(curFiles ++ prevFiles)

    val curDv = dvFiles(cur)
    val curEq = eqLines(cur)
    val post: Option[DataFrame] =
      if (addedFiles.isEmpty) None
      else if (curDv.isEmpty && curEq.isEmpty)
        // fast path (append-only tables): one footer-planned read, no
        // lineage columns, no join
        Some(toLogical(readFiles(spark, dir, addedFiles),
          ms, passthrough = partCols))
      else
        // a commit can (re-)add files TOGETHER with dv/eq lines hiding
        // some of their rows — restore(v) re-instates the target's dv
        // sidecars with its files, and an appended row can match a
        // pre-existing equality-delete key. Post-images are the added
        // files' rows AS VISIBLE at v (same dv/eq application as
        // [[read]]): a hidden row was never logically inserted.
        Some(toLogical(applyEqDeletes(spark, dir,
          applyDv(spark, dir, lineageScan(spark, dir, addedFiles,
            ms.map(physicalSchema)), curDv),
          cur), ms, passthrough = partCols)
          // toLogical(None) is identity (never-altered tables): the
          // lineage columns must still not leak into the feed schema
          .drop("_dv_file", "_dv_idx"))

    // pre (a): removed files' rows AS VISIBLE at v-1 (dv/eq applied —
    // rows already hidden were not logically present, so not "deleted")
    val preRewrite: Option[DataFrame] =
      if (removedFiles.isEmpty) None
      else Some(toLogical(applyEqDeletes(spark, dir,
        applyDv(spark, dir, lineageScan(spark, dir, removedFiles,
          metaSchema(prev).map(physicalSchema)), prevDv),
        prev), ms, passthrough = partCols)
        .drop("_dv_file", "_dv_idx"))

    // pre (b): rows the commit's NEW dv entries hide — read ONLY the
    // dv-touched files (a driver-sized census of the new sidecars), with
    // v-1's own deletes subtracted first so a double-listed position
    // cannot produce a phantom pre-image
    val preDv: Option[DataFrame] =
      if (newDvSidecars.isEmpty) None
      else {
        val entries = spark.read.schema(DvSidecarSchema)
          .parquet(newDvSidecars.map(f => s"$dir/$f"): _*)
          .select(col("_dv_file"), col("_dv_idx"))
        val touched = entries.select("_dv_file").distinct()
          .collect().map(_.getString(0)).toSeq
          .filter(prevFiles.toSet) // positions only bind to v-1 files
        if (touched.isEmpty) None
        else Some(toLogical(applyEqDeletes(spark, dir,
          applyDv(spark, dir, lineageScan(spark, dir, touched,
            metaSchema(prev).map(physicalSchema)), prevDv),
          prev)
          .join(entries, Seq("_dv_file", "_dv_idx"), "left_semi"),
          ms, passthrough = partCols)
          .drop("_dv_file", "_dv_idx"))
      }

    // pre (c): rows of v-1 matching NEW equality-delete key sets
    // (sidecars carry PHYSICAL key names; the visible frame is logical)
    val preEq: Option[DataFrame] =
      if (newEq.isEmpty) None
      else {
        val p2l = ms.map(s => s.fields.map(f => physName(f) -> f.name).toMap)
          .getOrElse(Map.empty[String, String])
        val visible = read(spark, dir, Some(v - 1))
        val frames = newEq.groupBy(_._2).map { case (cols, entries) =>
          val efiles = entries.map(_._1)
          val er0 = spark.read
          val keyDf = footerMergedSchema(spark, dir, efiles, strict = true)
            .fold(er0)(er0.schema)
            .parquet(efiles.map(f => s"$dir/$f"): _*)
          val cond = cols.map(c =>
            visible(p2l.getOrElse(c, c)) <=> keyDf(c)).reduce(_ && _)
          visible.join(keyDf, cond, "left_semi")
        }
        frames.reduceOption(_.unionByName(_))
      }

    val pre = Seq(preRewrite, preDv, preEq).flatten
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    val stamp = (df: DataFrame, ct: String) => df
      .withColumn("_change_type", lit(ct))
      .withColumn("_commit_version", lit(v))
    (pre, post) match {
      case (None, None) => None
      case (Some(p), None) => Some(stamp(p, "delete"))
      case (None, Some(q)) => Some(stamp(q, "insert"))
      case (Some(p), Some(q)) if keys.isEmpty =>
        // no business key: a delta/rewrite commit's two sides can only be
        // labeled wholesale (exact for a pure UPDATE; see scaladoc)
        Some(stamp(p, "update_preimage").unionByName(
          stamp(q, "update_postimage"), allowMissingColumns = true))
      case (Some(p), Some(q)) =>
        // pair by key: INTERSECT is null-safe, so null-keyed rows pair too
        val shared = p.select(keys.map(col): _*)
          .intersect(q.select(keys.map(col): _*))
          .select(keys.map(k => col(k).as(s"_ck_$k")): _*)
        // Delta-CDF fidelity: a copy-on-write rewrite carries EVERY row
        // of the rewritten file through pre and post — rows whose values
        // did not change are not updates (a 1-row upsert into a 20-row
        // file is 1 update pair, not 20). Suppress keys whose full row is
        // identical on both sides (null-safe set intersect over all
        // columns); they emit nothing, like Delta's change files. Both
        // sides are commit-sized frames, so the extra intersect/except
        // carries only the commit's own change set. ONLY rewrite commits
        // (files removed) need it: a dv-delta commit's pre/post hold
        // exactly the rows the command touched — Delta CDF emits those
        // as-is, and the two set ops would cost a pure-delta window ~45%
        // for nothing (measured on the cdc_dml gate). Known divergence
        // from Delta CDF: suppression keys on VALUE change, not on the
        // command-touched set — a genuine no-op UPDATE (SET v = v hitting
        // a copy-on-write rewrite) emits nothing here, whereas Delta
        // writes update_preimage/update_postimage for every matched row
        // even when values are unchanged. We prefer the value-change
        // contract (a consumer reacting to "changes" gets only changes);
        // callers needing command-touched fidelity can read the pre/post
        // frames of the commit directly. Also skipped when
        // the two sides' column sets differ (schema changed mid-commit) —
        // then "identical" is ill-defined and every pair stays an update.
        val changedShared =
          if (removedFiles.isEmpty ||
            p.columns.sorted.toSeq != q.columns.sorted.toSeq) shared
          else shared.except(
            p.intersect(q.select(p.columns.map(col).toIndexedSeq: _*))
              .select(keys.map(k => col(k).as(s"_ck_$k")): _*))
        def cond(df: DataFrame) =
          keys.map(k => df(k) <=> col(s"_ck_$k")).reduce(_ && _)
        Some(Seq(
          stamp(p.join(changedShared, cond(p), "left_semi"), "update_preimage"),
          stamp(p.join(shared, cond(p), "left_anti"), "delete"),
          stamp(q.join(changedShared, cond(q), "left_semi"), "update_postimage"),
          stamp(q.join(shared, cond(q), "left_anti"), "insert"))
          .reduce(_.unionByName(_, allowMissingColumns = true)))
    }
  }

  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // op/txn come from the version's own log file (one small read each);
    // n_files needs the resolved snapshot — oldest-first so each version
    // resolves incrementally off its predecessor via the snapshot cache
    // rather than walking back to a checkpoint V times
    versions(spark, dir).map { v =>
      val meta = versionMeta(spark, dir, v)
      val op = meta.find(_.startsWith("#op="))
        .map(_.stripPrefix("#op=")).getOrElse("write")
      val txn = meta.find(_.startsWith("#txn=")).map(_.stripPrefix("#txn="))
      (v, op,
        manifestLines(spark, dir, v).count(!_.startsWith("#")), txn)
    }.reverse.toDF("version", "operation", "n_files", "txn")
  }
}
