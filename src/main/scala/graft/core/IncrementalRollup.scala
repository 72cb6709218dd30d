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
  * count/sum add, min/max combine, avg derives from (sum, count) at read
  * time — never stored (stored averages don't merge) — and the optional
  * distinct-count sketch merges as a k-min-set union
  * ([[graft.ops.Sketches.kmvMergeAgg]]; exact distinct counts do NOT merge,
  * which is why warehouses can't maintain them incrementally). Sums are
  * kept in exact integer cents (see [[graft.queries.Num]]) so merge
  * order — batch arrival order, partition order, cluster size — cannot
  * change results; the md5-hashed sketch is order-free by construction.
  *
  * State is tiny relative to the facts (|distinct keys| rows), so the merge
  * rewrite is cheap; for billion-key states partition the state by a key
  * bucket and rewrite only affected buckets (same pattern as
  * [[Scd2.mergeBucketed]]).
  */
object IncrementalRollup {

  /** Sketch size for the optional distinct-count state (±~6% at k=256). */
  val KmvK = 256

  private def stateAggs(withKmv: Boolean) = Seq(
    sum(col("cnt")).as("cnt"),
    sum(col("sum_cents")).as("sum_cents"),
    min(col("min_cents")).as("min_cents"),
    max(col("max_cents")).as("max_cents")) ++
    (if (withKmv) Seq(graft.ops.Sketches.kmvMergeAgg(col("kmv"), KmvK).as("kmv"))
     else Seq.empty)

  /** One batch's partial aggregates; `distinctCol` adds a KMV k-min-set
    * sketch of that column so the state can answer approx-distinct.
    */
  def partial(batch: DataFrame, keys: Seq[String], valueCol: String,
              distinctCol: Option[String] = None): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("cnt"),
      sum(round(col(valueCol) * 100).cast("long")).as("sum_cents"),
      min(round(col(valueCol) * 100).cast("long")).as("min_cents"),
      max(round(col(valueCol) * 100).cast("long")).as("max_cents")) ++
      distinctCol.map(c => graft.ops.Sketches.kmv(
        graft.ops.Hashing.md5Long(col(c)), KmvK).as("kmv"))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** State lives in versioned subdirectories `v=N`; a version COUNTS only
    * once its `_SUCCESS` marker exists (written last by the parquet
    * committer). Readers pick the highest complete version, updates write
    * version N+1 and only then garbage-collect older ones — so a crash at
    * any point leaves the previous complete version authoritative, instead
    * of the delete-then-rewrite-in-place scheme whose mid-write crash
    * silently reset the state to just the newest batch.
    */
  private def versions(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[(Long, Path)] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => (s.getPath.getName.stripPrefix("v=").toLong, s.getPath))
      .filter { case (_, vp) => fs.exists(new Path(vp, "_SUCCESS")) }
      .sortBy(_._1)

  private def latestVersion(spark: SparkSession, statePath: String): Option[Path] = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions(fs, p).lastOption.map(_._2)
  }

  /** Merge a new batch into the persisted state at `statePath`. */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             keys: Seq[String], valueCol: String,
             distinctCol: Option[String] = None): Unit = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = partial(batch, keys, valueCol, distinctCol)
    val existing = versions(fs, p)
    val next = new Path(p, f"v=${existing.lastOption.map(_._1).getOrElse(0L) + 1}%08d")
    val aggs = stateAggs(distinctCol.isDefined)
    val merged = existing.lastOption match {
      case None => fresh
      case Some((_, cur)) =>
        val prev = spark.read.parquet(cur.toString)
        val prevHasKmv = prev.columns.contains("kmv")
        // reconcile a distinctCol config change against persisted state:
        // DROPPING the sketch is a clean downgrade (discard the column);
        // ADDING one cannot be honest — history's hashes are gone from the
        // merged partials, so a conjured empty sketch would silently
        // undercount forever. Fail with the recovery path instead.
        if (distinctCol.isDefined && !prevHasKmv)
          throw new IllegalStateException(
            s"rollup state at $statePath was built without distinctCol; a KMV " +
            "sketch cannot be recovered from merged partials. Delete the state " +
            "directory and replay history with distinctCol set, or keep " +
            "distinctCol=None.")
        val prevAligned = if (prevHasKmv && distinctCol.isEmpty) prev.drop("kmv")
                          else prev
        prevAligned
          .unionByName(fresh)
          .groupBy(keys.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
    }
    // overwrite handles a partial `next` left by a crashed previous attempt
    merged.write.mode("overwrite").parquet(next.toString)
    // only after the new version is complete: drop superseded versions
    existing.foreach { case (_, vp) => fs.delete(vp, true) }
  }

  /** Read-time view: derived statistics from the mergeable state (adds
    * `approx_distinct` when the state carries the KMV sketch).
    */
  def result(spark: SparkSession, statePath: String): DataFrame = {
    val state = spark.read.parquet(latestVersion(spark, statePath)
      .getOrElse(throw new IllegalStateException(
        s"no complete rollup state under $statePath")).toString)
    val withDerived = state
      .withColumn("sum_value", col("sum_cents").cast("double") / 100.0)
      .withColumn("avg_value",
        round((col("sum_cents").cast("double") / col("cnt")) / 100.0, 6))
      .withColumn("min_value", col("min_cents").cast("double") / 100.0)
      .withColumn("max_value", col("max_cents").cast("double") / 100.0)
      .drop("sum_cents", "min_cents", "max_cents")
    if (state.columns.contains("kmv"))
      withDerived
        .withColumn("approx_distinct",
          graft.ops.Sketches.kmvEstimate(col("kmv"), KmvK))
        .drop("kmv")
    else withDerived
  }
}
