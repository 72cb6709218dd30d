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
  * The rewrite stages into `<dir>/.compact_tmp` and then swaps, so a crashed
  * compaction never corrupts the live table (readers see old files until the
  * atomic-ish rename pass completes).
  */
object Maintenance {

  /** Total bytes of data files directly under `dir`. */
  private def dataFiles(spark: SparkSession, dir: String): Seq[(Path, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath, s.getLen))
  }

  /** Compact `dir` (a non-partitioned parquet directory) into
    * ceil(totalBytes / targetBytes) files, sorted by `clusterBy` when given.
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              clusterBy: Seq[String] = Seq.empty): (Int, Int) = {
    val before = dataFiles(spark, dir)
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(_._2).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val arranged: DataFrame =
      if (clusterBy.nonEmpty)
        // range-partition on the cluster key then sort within: each output
        // file owns a disjoint key range -> tight min/max stats for skipping
        df.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else df.repartition(nFiles)

    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, ".compact_tmp")
    fs.delete(tmp, true)
    arranged.write.mode("overwrite").parquet(tmp.toString)
    // swap: remove old data files, move compacted ones up, drop tmp
    before.foreach { case (f, _) => fs.delete(f, false) }
    fs.listStatus(tmp).filter(_.isFile)
      .filter(s => !s.getPath.getName.startsWith("_"))
      .foreach(s => fs.rename(s.getPath, new Path(dir, s.getPath.getName)))
    fs.delete(tmp, true)
    (before.size, dataFiles(spark, dir).size)
  }
}
