package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate state: the batch analogue of a
  * streaming materialized view, and the only sane way to keep a dashboard
  * rollup over a 100 TB append-only fact table — each new batch contributes
  * its PARTIAL aggregates (one shuffle over the batch, which is small), and
  * the persisted state merges partials instead of rescanning history.
  *
  * Works because every maintained statistic is a commutative monoid merge:
  * count/sum add, min/max combine, and avg derives from (sum, count) at
  * read time — never stored (stored averages don't merge). Sums are kept in
  * exact integer cents (see [[graft.queries.Num]]) so merge order — batch
  * arrival order, partition order, cluster size — cannot change results.
  *
  * State is tiny relative to the facts (|distinct keys| rows), so the merge
  * rewrite is cheap; for billion-key states partition the state by a key
  * bucket and rewrite only affected buckets (same pattern as
  * [[Scd2.mergeBucketed]]).
  */
object IncrementalRollup {

  private val stateAggs = Seq(
    sum(col("cnt")).as("cnt"),
    sum(col("sum_cents")).as("sum_cents"),
    min(col("min_cents")).as("min_cents"),
    max(col("max_cents")).as("max_cents"))

  /** One batch's partial aggregates. */
  def partial(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(round(col(valueCol) * 100).cast("long")).as("sum_cents"),
        min(round(col(valueCol) * 100).cast("long")).as("min_cents"),
        max(round(col(valueCol) * 100).cast("long")).as("max_cents"))

  /** Merge a new batch into the persisted state at `statePath`. */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             keys: Seq[String], valueCol: String): Unit = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = partial(batch, keys, valueCol)
    // a bare pre-created directory is "no state yet"
    val hasState = fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.endsWith(".parquet"))
    if (!hasState) {
      fresh.write.mode("overwrite").parquet(statePath)
    } else {
      val merged = spark.read.parquet(statePath)
        .unionByName(fresh)
        .groupBy(keys.map(col): _*)
        .agg(stateAggs.head, stateAggs.tail: _*)
        // state must be fully materialized before its own overwrite
        .localCheckpoint()
      merged.write.mode("overwrite").parquet(statePath)
    }
  }

  /** Read-time view: derived statistics from the mergeable state. */
  def result(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .withColumn("sum_value", col("sum_cents").cast("double") / 100.0)
      .withColumn("avg_value",
        round((col("sum_cents").cast("double") / col("cnt")) / 100.0, 6))
      .withColumn("min_value", col("min_cents").cast("double") / 100.0)
      .withColumn("max_value", col("max_cents").cast("double") / 100.0)
      .drop("sum_cents", "min_cents", "max_cents")
}
