package graft.core

import org.apache.spark.sql.SparkSession

/** Metadata-only input sizing: total bytes of named parquet tables under a
  * data dir, from the file listing alone (no Spark job). Size-adaptive
  * operators (graph join geometry, SSJoin candidate generation) read this
  * BEFORE planning to pick the small-data or at-scale formulation.
  */
object InputSize {
  def bytes(s: SparkSession, dir: String, tables: Seq[String]): Long =
    tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(dir, t)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L
      else if (fs.getFileStatus(p).isFile) fs.getFileStatus(p).getLen
      else fs.listStatus(p).map(_.getLen).sum
    }.sum
}
