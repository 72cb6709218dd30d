package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Plan-introspection helpers for specs: AQE hides its subtree behind
  * leaf wrappers, so a naive collectLeaves on an adaptive plan sees no
  * scans at all.
  */
object TestPlans {

  def scans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec        => scans(q.plan)
    case s if s.nodeName.toLowerCase.contains("scan") && s.children.isEmpty =>
      Seq(s)
    case other =>
      other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
  }

  /** Total numFiles across every file scan the executed plan ran. Call
    * AFTER an action so AQE has finalized and metrics are populated.
    */
  def scannedFiles(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
  }
}
