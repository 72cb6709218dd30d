package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Session, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's named queries; `oracleSql`
  * carries the DuckDB-equivalent SQL for the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Session.tune(spark)
    queries("q_join_revenue_nation")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Temporal.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.DedupOps.queries ++
      graft.queries.SimilarityOps.queries ++
      graft.queries.ScdOps.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.FaersOps.queries ++
      graft.queries.FaersAnalyticsOps.queries ++
      graft.queries.FaersFactOps.queries ++
      graft.queries.MultimodalOps.queries ++
      graft.queries.EventOps.queries ++
      graft.queries.ScaleOps.queries ++
      graft.queries.SetGroupOps.queries ++
      graft.queries.JoinOps.queries ++
      graft.queries.WindowArrayOps.queries ++
      graft.queries.TrainPrepOps.queries ++
      graft.queries.SqlSurfaceOps.queries ++
      graft.queries.SourceOps.queries ++
      graft.queries.SnapshotOps.queries ++
      graft.queries.SketchOps.queries ++
      graft.queries.RollupOps.queries ++
      graft.queries.GraphOps.queries ++
      graft.queries.CorpusOps.queries ++
      graft.queries.BehaviorOps.queries ++
      graft.queries.QualityOps.queries ++
      graft.queries.PrivacyOps.queries ++
      graft.queries.LmOps.queries ++
      graft.queries.BasketOps.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Temporal.oracles ++
      graft.queries.TextOps.oracles ++
      graft.queries.DedupOps.oracles ++
      graft.queries.SimilarityOps.oracles ++
      graft.queries.ScdOps.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.FaersOps.oracles ++
      graft.queries.FaersAnalyticsOps.oracles ++
      graft.queries.FaersFactOps.oracles ++
      graft.queries.MultimodalOps.oracles ++
      graft.queries.EventOps.oracles ++
      graft.queries.ScaleOps.oracles ++
      graft.queries.SetGroupOps.oracles ++
      graft.queries.JoinOps.oracles ++
      graft.queries.WindowArrayOps.oracles ++
      graft.queries.TrainPrepOps.oracles ++
      graft.queries.SqlSurfaceOps.oracles ++
      graft.queries.SourceOps.oracles ++
      graft.queries.SnapshotOps.oracles ++
      graft.queries.SketchOps.oracles ++
      graft.queries.RollupOps.oracles ++
      graft.queries.GraphOps.oracles ++
      graft.queries.CorpusOps.oracles ++
      graft.queries.BehaviorOps.oracles ++
      graft.queries.QualityOps.oracles ++
      graft.queries.PrivacyOps.oracles ++
      graft.queries.LmOps.oracles ++
      graft.queries.BasketOps.oracles
}
