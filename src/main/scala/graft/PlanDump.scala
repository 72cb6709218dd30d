package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round evidence tool: dump `.explain("formatted")` for the
  * named queries to `plans/<tag>/<query>_<suffix>.txt` — the before/after
  * plan artifacts OPTIMIZATION_r*.md cites.
  *
  * Usage: tools/run.sh graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,...
  * Runs at the bench's geometry (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus) so the dumped plan is the one the bench executes,
  * not a 4-core variant.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.queries.Scratch.dir("plandump_warehouse"))
      .getOrCreate()
    graft.core.Session.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"unknown query: $name")
        case Some(fn) =>
          val plan =
            try fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            catch { case e: Throwable => s"(failed: ${e.getMessage})" }
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
