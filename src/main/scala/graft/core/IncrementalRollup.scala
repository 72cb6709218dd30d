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

  /** Bucket count for the optional quantile-histogram state. */
  val HistBuckets = 128

  private val StateCols =
    Set("cnt", "sum_cents", "min_cents", "max_cents", "kmv", "hist")

  private def stateAggs(withKmv: Boolean, withHist: Boolean) = Seq(
    sum(col("cnt")).as("cnt"),
    sum(col("sum_cents")).as("sum_cents"),
    min(col("min_cents")).as("min_cents"),
    max(col("max_cents")).as("max_cents")) ++
    (if (withKmv) Seq(graft.ops.Sketches.kmvMergeAgg(col("kmv"), KmvK).as("kmv"))
     else Seq.empty) ++
    (if (withHist) Seq(expr(
      s"""aggregate(collect_list(hist), array_repeat(0L, $HistBuckets),
         |(acc, h) -> zip_with(acc, h, (x, y) -> x + y))""".stripMargin)
      .as("hist")) else Seq.empty)

  /** Per-key bucket-count array over `valueCol` cents — the mergeable
    * quantile state (element-wise-additive, like the CMS counter matrix).
    * Bounds are FIXED per rollup (mergeability demands one bucket grid
    * across all batches); out-of-range values clamp to the edge buckets.
    */
  private def histPartial(batch: DataFrame, keys: Seq[String], valueCol: String,
                          lo: Long, hi: Long): DataFrame = {
    val span = hi - lo + 1
    batch
      .select(keys.map(col) :+ round(col(valueCol) * 100).cast("long").as("c"): _*)
      // null values carry no quantile information (base aggs skip them in
      // sum/min/max too) — and a null bucket would blow up map_from_entries
      .filter(col("c").isNotNull)
      // clamp the VALUE into [lo,hi] before the multiply: a far-out-of-
      // range value would overflow (c-lo)*buckets into a negative Long and
      // land in bucket 0 instead of the top edge bucket the contract
      // promises
      .withColumn("b", expr(
        s"((least(greatest(c, ${lo}L), ${hi}L) - ${lo}L) * $HistBuckets) div ${span}L"))
      .withColumn("b", expr(s"least(${HistBuckets - 1}L, b)"))
      .groupBy(keys.map(col) :+ col("b"): _*)
      .agg(count(lit(1)).as("n"))
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("b").cast("int"), col("n"))))
        .as("m"))
      .select(keys.map(col) :+ expr(
        s"transform(sequence(0, ${HistBuckets - 1}), i -> coalesce(element_at(m, i), 0L))")
        .as("hist"): _*)
  }

  /** One batch's partial aggregates; `distinctCol` adds a KMV k-min-set
    * sketch of that column so the state can answer approx-distinct;
    * `histBounds` (lo,hi in CENTS of `valueCol`) adds the bucket-count
    * histogram so the state can answer approximate quantiles.
    */
  def partial(batch: DataFrame, keys: Seq[String], valueCol: String,
              distinctCol: Option[String] = None,
              histBounds: Option[(Long, Long)] = None): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("cnt"),
      sum(round(col(valueCol) * 100).cast("long")).as("sum_cents"),
      min(round(col(valueCol) * 100).cast("long")).as("min_cents"),
      max(round(col(valueCol) * 100).cast("long")).as("max_cents")) ++
      distinctCol.map(c => graft.ops.Sketches.kmv(
        graft.ops.Hashing.md5Long(col(c)), KmvK).as("kmv"))
    val base = batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    histBounds match {
      case None => base
      case Some((lo, hi)) =>
        // null-SAFE join: a null group key is a real group in the base
        // aggregates, and a plain equi-join would silently drop it. Left
        // join because an all-null-valued group has no histogram row (its
        // hist reads as null; the merge's collect_list skips nulls, which
        // is exactly "zero counts").
        val h = histPartial(batch, keys, valueCol, lo, hi)
        val cond = keys.map(k => base(k) <=> h(k)).reduce(_ && _)
        base.join(h, cond, "left")
          .select(keys.map(base(_)) ++ StateCols.toSeq.sorted
            .filter(base.columns.contains).map(base(_)) :+ h("hist"): _*)
    }
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

  /** Persisted histogram bounds: one grid per rollup, forever — merging
    * counts bucketed on different grids would be silent nonsense.
    */
  private def boundsPath(p: Path) = new Path(p, "_hist_bounds")

  private def storedBounds(fs: org.apache.hadoop.fs.FileSystem,
                           p: Path): Option[(Long, Long)] = {
    val bp = boundsPath(p)
    if (!fs.exists(bp)) None
    else {
      val in = fs.open(bp)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
      val Array(lo, hi) = s.split(","); Some((lo.toLong, hi.toLong))
    }
  }

  private[core] def readBounds(spark: SparkSession, statePath: String): (Long, Long) = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(boundsPath(p))
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
    val Array(lo, hi) = s.split(","); (lo.toLong, hi.toLong)
  }

  /** Merge a new batch into the persisted state at `statePath`. */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             keys: Seq[String], valueCol: String,
             distinctCol: Option[String] = None,
             histBounds: Option[(Long, Long)] = None): Unit = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = versions(fs, p)
    // grid-mismatch check up front — but ONLY against state that exists:
    // a bounds file orphaned by a crashed first update (bounds written,
    // state write died) must not lock the operator out of retrying with
    // corrected bounds when there is no data to mismatch against
    for (b <- histBounds; st <- storedBounds(fs, p)
         if b != st && existing.nonEmpty)
      throw new IllegalStateException(
        s"rollup at $p was built with histogram bounds $st; got $b. One " +
        "bucket grid per rollup — rebuild the state to change bounds.")
    val fresh = partial(batch, keys, valueCol, distinctCol, histBounds)
    val next = new Path(p, f"v=${existing.lastOption.map(_._1).getOrElse(0L) + 1}%08d")
    val aggs = stateAggs(distinctCol.isDefined, histBounds.isDefined)
    val merged = existing.lastOption match {
      case None => fresh
      case Some((_, cur)) =>
        val prev = spark.read.parquet(cur.toString)
        // reconcile sketch-config changes against persisted state:
        // DROPPING a sketch is a clean downgrade (discard the column);
        // ADDING one cannot be honest — history's raw values are gone from
        // the merged partials, so a conjured empty sketch would silently
        // undercount forever. Fail with the recovery path instead.
        def reconcile(want: Boolean, colName: String, what: String): Unit =
          if (want && !prev.columns.contains(colName))
            throw new IllegalStateException(
              s"rollup state at $statePath was built without $what; it cannot " +
              "be recovered from merged partials. Delete the state directory " +
              s"and replay history, or keep $what off.")
        reconcile(distinctCol.isDefined, "kmv", "distinctCol")
        reconcile(histBounds.isDefined, "hist", "histBounds")
        val drops =
          (if (prev.columns.contains("kmv") && distinctCol.isEmpty) Seq("kmv") else Nil) ++
          (if (prev.columns.contains("hist") && histBounds.isEmpty) Seq("hist") else Nil)
        prev.drop(drops: _*)
          .unionByName(fresh)
          .groupBy(keys.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
    }
    // bounds persist AFTER all validation (a rejected update must leave no
    // stale grid metadata) but BEFORE the state write — a crash between a
    // hist-bearing version and its bounds would otherwise leave state
    // whose grid a later update could silently redefine. When no complete
    // version exists yet (first update, or a retry after a crashed first
    // attempt), this call's bounds are authoritative and overwrite any
    // orphaned file.
    for ((lo, hi) <- histBounds
         if storedBounds(fs, p).isEmpty || existing.isEmpty) {
      val out = fs.create(boundsPath(p), true)
      try out.write(s"$lo,$hi".getBytes("UTF-8")) finally out.close()
    }
    // overwrite handles a partial `next` left by a crashed previous attempt
    merged.write.mode("overwrite").parquet(next.toString)
    // only after the new version is complete: drop superseded versions
    existing.foreach { case (_, vp) => fs.delete(vp, true) }
  }

  /** Read-time view: derived statistics from the mergeable state (adds
    * `approx_distinct` when the state carries the KMV sketch, and
    * `p50/p95/p99` when it carries the quantile histogram — same
    * integer-`div` bucket-edge math as `SketchOps.approxQuantiles`).
    */
  def result(spark: SparkSession, statePath: String): DataFrame = {
    val state = spark.read.parquet(latestVersion(spark, statePath)
      .getOrElse(throw new IllegalStateException(
        s"no complete rollup state under $statePath")).toString)
    val withDerived = state
      .withColumn("sum_value", col("sum_cents").cast("double") / 100.0)
      .withColumn("avg_value",
        floor((col("sum_cents").cast("double") / col("cnt")) / 100.0 * 1000000 + 0.5) / 1000000)
      .withColumn("min_value", col("min_cents").cast("double") / 100.0)
      .withColumn("max_value", col("max_cents").cast("double") / 100.0)
      .drop("sum_cents", "min_cents", "max_cents")
    val withKmv =
      if (state.columns.contains("kmv"))
        withDerived
          .withColumn("approx_distinct",
            graft.ops.Sketches.kmvEstimate(col("kmv"), KmvK))
          .drop("kmv")
      else withDerived
    if (state.columns.contains("hist")) {
      val (lo, hi) = readBounds(spark, statePath)
      val span = hi - lo + 1
      // min bucket whose running count reaches ceil(pct% of total) = the
      // NUMBER of strict-prefix sums below the target (cumsum is
      // nondecreasing); then that bucket's upper edge in dollars — all
      // integer div, same math as SketchOps.approxQuantiles
      def pick(pct: Int) = expr(
        s"""cast(${lo}L + ((aggregate(hist, named_struct('cum', 0L, 'k', 0L),
           |  (s, x) -> named_struct('cum', s.cum + x,
           |    'k', s.k + if(s.cum + x < (hist_total * $pct + 99) div 100, 1L, 0L))
           |  ).k + 1) * ${span}L) div $HistBuckets as double) / 100.0""".stripMargin)
      withKmv
        .withColumn("hist_total", expr("aggregate(hist, 0L, (a, x) -> a + x)"))
        .withColumn("p50", pick(50))
        .withColumn("p95", pick(95))
        .withColumn("p99", pick(99))
        .drop("hist", "hist_total")
    } else withKmv
  }
}
