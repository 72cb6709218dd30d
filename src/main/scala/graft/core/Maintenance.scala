package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance: the engine's answer to the reference's Delta
  * `OPTIMIZE` (dim_patient.py:154-157) on plain Parquet tables.
  *
  * Streaming ingest and per-batch appends accrete small files; at 100 TB the
  * resulting task-per-file scheduling and footer-read overhead dominate scan
  * cost. `compact` rewrites a directory to ~`targetBytes` files, optionally
  * sort-clustered so parquet row-group min/max statistics become selective
  * (the poor man's Z-order: one clustering dimension — pick the dominant
  * filter column).
  *
  * Crash safety — a write-ahead commit marker makes the swap recoverable at
  * any interruption point (no transaction log on plain parquet, so this is
  * the strongest guarantee available; readers racing a mid-swap compaction
  * can still see partial state — schedule compactions in a maintenance
  * window or move to a table format with a log for serializable swaps):
  *  1. stage compacted files into `.compact_tmp` (complete when the parquet
  *     committer writes `_SUCCESS`);
  *  2. write `.compact_commit` containing this run's id — the point of no
  *     return;
  *  3. delete old data files (anything not prefixed `compact-<runId>-`);
  *  4. move staged files in as `compact-<runId>-<name>`;
  *  5. remove marker + tmp.
  * [[recover]] runs at every `compact` entry: marker absent → stale tmp is
  * discarded (old data authoritative); marker present → steps 3-5 are
  * re-applied (staged files are complete, so the swap finishes exactly).
  */
object Maintenance {

  private val TmpName = ".compact_tmp"
  private val MarkerName = ".compact_commit"

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data files directly under `dir` (ignores dot/underscore entries). */
  private def dataFiles(spark: SparkSession, dir: String): Seq[(Path, Long)] = {
    val p = new Path(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath, s.getLen))
  }

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                            from: Path, to: Path): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"rename failed: $from -> $to")

  /** Finish (marker present) or roll back (marker absent) an interrupted
    * compaction. Idempotent; called on every [[compact]] entry.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir, TmpName)
    val marker = new Path(dir, MarkerName)
    if (fs.exists(marker)) {
      // committed: staged files are complete — re-apply steps 3-5
      val runId = {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      }
      val keepPrefix = s"compact-$runId-"
      dataFiles(spark, dir)
        .filterNot(_._1.getName.startsWith(keepPrefix))
        .foreach { case (f, _) => fs.delete(f, false) }
      if (fs.exists(tmp))
        fs.listStatus(tmp).filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
          .foreach { s =>
            renameOrThrow(fs, s.getPath, new Path(dir, keepPrefix + s.getPath.getName))
          }
      fs.delete(tmp, true)
      fs.delete(marker, false)
    } else if (fs.exists(tmp)) {
      // died before commit: old data is authoritative, staging is garbage
      fs.delete(tmp, true)
    }
  }

  /** Compact `dir` (a non-partitioned parquet directory) into
    * ceil(totalBytes / targetBytes) files, sorted by `clusterBy` when
    * given, or Z-order-clustered on a column PAIR via `zorderBy` (filters
    * on either column then skip most files — a single-column sort only
    * serves its own column). Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              clusterBy: Seq[String] = Seq.empty,
              zorderBy: Option[(String, String)] = None): (Int, Int) = {
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "pass clusterBy OR zorderBy, not both — they prescribe conflicting layouts")
    recover(spark, dir)
    val before = dataFiles(spark, dir)
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(_._2).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // already-compact layout: rewriting can't reduce the file count, so
    // OPTIMIZE is a no-op (Delta's bin-packing skip). Clustering requests
    // always rewrite — they prescribe an ORDER, not just a size.
    if (clusterBy.isEmpty && zorderBy.isEmpty && before.size <= nFiles)
      return (before.size, before.size)
    val df = spark.read.parquet(dir)
    val arranged: DataFrame = zorderBy match {
      case Some((xc, yc)) =>
        // min/max-normalize both columns into the 31-bit Morton domain
        // (driver scalars — a layout-time cost, like file listing), key by
        // graft_zorder, range-partition + sort on the key, then drop it:
        // each file owns a z-curve segment = a region tight in BOTH dims
        val r = df.agg(
          min(col(xc)).cast("double"), max(col(xc)).cast("double"),
          min(col(yc)).cast("double"), max(col(yc)).cast("double")).first()
        def norm(c: String, lo: Double, hi: Double) = {
          val span = if (hi > lo) hi - lo else 1.0
          (((col(c).cast("double") - lit(lo)) / lit(span)) *
            lit(((1L << 31) - 1).toDouble)).cast("long")
        }
        df.withColumn("_zkey", call_function("graft_zorder",
            norm(xc, r.getDouble(0), r.getDouble(1)),
            norm(yc, r.getDouble(2), r.getDouble(3))))
          .repartitionByRange(nFiles, col("_zkey"))
          .sortWithinPartitions(col("_zkey"))
          .drop("_zkey")
      case None if clusterBy.nonEmpty =>
        // range-partition on the cluster key then sort within: each output
        // file owns a disjoint key range -> tight min/max stats for skipping
        df.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      case None => df.repartition(nFiles)
    }

    val fs = fsOf(spark, dir)
    val tmp = new Path(dir, TmpName)
    val marker = new Path(dir, MarkerName)
    arranged.write.mode("overwrite").parquet(tmp.toString)

    val runId = java.util.UUID.randomUUID().toString.take(8)
    val out = fs.create(marker, true)
    try out.write(runId.getBytes("UTF-8")) finally out.close()

    before.foreach { case (f, _) => fs.delete(f, false) }
    fs.listStatus(tmp).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
      .foreach { s =>
        renameOrThrow(fs, s.getPath, new Path(dir, s"compact-$runId-" + s.getPath.getName))
      }
    fs.delete(tmp, true)
    fs.delete(marker, false)
    (before.size, dataFiles(spark, dir).size)
  }

  /** OPTIMIZE for a hive-partitioned table directory: compact every leaf
    * partition independently (Delta's OPTIMIZE does exactly this — bins
    * never span partitions). Leaves are found by walking `key=value`
    * subdirectories; each leaf gets the same crash-safe staged rewrite,
    * so an interruption affects at most one partition. Partitions
    * parallelize trivially on a cluster; sequential here.
    * Returns (filesBefore, filesAfter) summed over leaves.
    */
  def compactPartitioned(spark: SparkSession, dir: String,
                         targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = fsOf(spark, dir)
    def leaves(p: Path): Seq[Path] = {
      val subdirs = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (subdirs.isEmpty) Seq(p) else subdirs.flatMap(s => leaves(s.getPath))
    }
    if (!fs.exists(new Path(dir))) return (0, 0)
    leaves(new Path(dir))
      .map(leaf => compact(spark, leaf.toString, targetBytes))
      .foldLeft((0, 0)) { case ((b, a), (lb, la)) => (b + lb, a + la) }
  }
}
