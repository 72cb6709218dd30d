package graft.core

import org.apache.spark.sql.SparkSession

/** Local SparkSession factory mirroring the reference's runtime confs.
  *
  * The reference pins AQE + coalescePartitions + skewJoin on every job
  * (reference: resources/jobs/faers_pipeline.yml:17-19) and runs Spark 4.x
  * (Databricks 17.2.x-scala2.13). We mirror those and add local-mode sizing:
  * shuffle partitions = cores (not 200) so small-SF local runs don't drown in
  * empty tasks, while a real cluster deployment would size this to
  * 2-3x total executor cores.
  */
object Session {

  /** Confs we want on ANY session (cluster or local). Safe at 100 TB:
    * AQE re-plans shuffle partition counts / join strategies / skew splits
    * at runtime from actual stage statistics.
    */
  val commonConfs: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // FAERS date repair feeds garbage into to_date; reference relies on
    // permissive null-on-error semantics (PySpark default).
    "spark.sql.ansi.enabled" -> "false",
    // Some driver rounds generate events.parquet with TIMESTAMP(NANOS),
    // which the vectorized reader rejects outright; with this conf it reads
    // as long and the source wrapper (core.Tables.events) converts. Rounds
    // that emit timestamp[us] are unaffected by the conf.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
  )

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft",
            extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
    (commonConfs ++ extra).foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // MERGE targets get runtime source-key pruning (SQL-only surface, so
    // no API entry point exists to self-register it the way asof() does)
    graft.plans.MergeRuntimeFiltering.register(spark)
    spark
  }

  /** Apply common confs + register graft's native Catalyst functions on an
    * externally-created session (driver-owned).
    */
  def tune(spark: SparkSession): SparkSession = {
    commonConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    graft.functions.GraftFunctions.register(spark)
    // whole-plan extensions ride experimental.* on live sessions (the
    // extensions-class route needs to be present at session build)
    graft.plans.AsOfJoin.register(spark)
    graft.plans.MergeRuntimeFiltering.register(spark)
    spark
  }
}
