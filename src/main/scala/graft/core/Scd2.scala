package graft.core

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Injectable clock so SCD2 outputs are deterministic in tests/oracles
  * (SURVEY.md §7.5 hard part #2); production uses `ScdClock.system()`.
  */
final case class ScdClock(today: Date, now: Timestamp)

object ScdClock {
  def system(): ScdClock = {
    val ms = System.currentTimeMillis()
    ScdClock(new Date(ms), new Timestamp(ms))
  }
  def fixed(isoDate: String): ScdClock =
    ScdClock(Date.valueOf(isoDate), Timestamp.valueOf(s"$isoDate 00:00:00"))
}

/** SCD Type 2 versioned-dimension maintenance, same semantics as the
  * reference's two-phase Delta MERGE (reference: src/utils/scd_type2.py:
  * 19-61 metadata + surrogate key, 64-89 change hash, 111-226 merge),
  * re-expressed as a DataFrame union + overwrite since no Delta is present
  * locally (SURVEY.md §7.3).
  *
  * Preserved reference edge cases — deliberately NOT "fixed":
  *  - surrogate key = md5(business keys ++ effective_date), so two versions
  *    of one key created the same day collide (scd_type2.py:53);
  *  - a same-day rerun re-matches rows closed earlier today
  *    (`end_date = current_date`, scd_type2.py:206) and re-inserts their
  *    staged versions (MERGE #2 is keyed on closed-today, not closed-now);
  *  - business-key joins use plain equality (`target.k = source.k`), so
  *    null keys never match and always insert (scd_type2.py:160-176).
  *
  * Scale: the merge is one shuffle join of CURRENT rows against staged keys
  * plus a semi-join for phase-2 — history rows pass through untouched. At
  * 100 TB, partition the dimension table by `is_current` so the merge scans
  * only the current partition, and let AQE broadcast the staged side when
  * the delta is small.
  */
object Scd2 {

  val metaCols: Seq[String] = Seq(
    "row_hash", "effective_date", "end_date", "is_current",
    "created_ts", "updated_ts", "surrogate_key")

  private def nullSafeStr(c: Column): Column = coalesce(c.cast("string"), lit("NULL"))

  /** md5 change-detection hash over tracked attribute columns
    * (scd_type2.py:64-89).
    */
  def changeHash(trackedCols: Seq[String]): Column =
    md5(concat_ws("||", trackedCols.map(c => nullSafeStr(col(c))): _*))

  /** md5 surrogate key over business keys + effective_date
    * (scd_type2.py:40-61).
    */
  def surrogateKey(businessKeys: Seq[String]): Column =
    md5(concat_ws("||",
      businessKeys.map(c => nullSafeStr(col(c))) :+ nullSafeStr(col("effective_date")): _*))

  /** Stamp a staged snapshot with the SCD2 metadata columns
    * (scd_type2.py:19-61): open validity interval starting `clock.today`.
    */
  def addScdMetadata(df: DataFrame, businessKeys: Seq[String],
                     trackedCols: Seq[String], clock: ScdClock): DataFrame =
    df.withColumn("row_hash", changeHash(trackedCols))
      .withColumn("effective_date", lit(clock.today))
      .withColumn("end_date", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
      .withColumn("created_ts", lit(clock.now))
      .withColumn("updated_ts", lit(clock.now))
      .withColumn("surrogate_key", surrogateKey(businessKeys))

  /** Two-phase SCD2 merge. `target=None` is the initial load (overwrite,
    * scd_type2.py:145-151). Otherwise:
    *  - phase 1 ≡ MERGE #1 (scd_type2.py:177-196): current target rows whose
    *    key matches a staged row with a different row_hash are closed
    *    (end_date = today, is_current = false, updated_ts = now); staged
    *    rows whose key matches no current row are inserted;
    *  - phase 2 ≡ MERGE #2 (scd_type2.py:198-215): DISTINCT staged rows
    *    whose key was closed today (by this run or an earlier one) are
    *    inserted as new current versions.
    * Returns the full new table contents (caller overwrites the target).
    * `staged` must be one row per business key (dims `.distinct()` first,
    * as the reference does).
    */
  def applyScdType2Merge(target: Option[DataFrame], staged: DataFrame,
                         businessKeys: Seq[String], trackedCols: Seq[String],
                         clock: ScdClock): DataFrame = {
    val stagedMeta = addScdMetadata(staged, businessKeys, trackedCols, clock)
    target match {
      case None => stagedMeta
      case Some(t) =>
        val cur = t.filter(col("is_current"))
        val hist = t.filter(!col("is_current"))
        val stagedKeyed = stagedMeta.select(
          businessKeys.map(col) :+ col("row_hash").as("_staged_hash"): _*)
        val joined = cur.join(stagedKeyed, businessKeys, "left")
        val changed = col("_staged_hash").isNotNull && col("_staged_hash") =!= col("row_hash")
        val closed = joined.filter(changed)
          .drop("_staged_hash")
          .withColumn("end_date", lit(clock.today))
          .withColumn("is_current", lit(false))
          .withColumn("updated_ts", lit(clock.now))
        val unchanged = joined.filter(!changed).drop("_staged_hash")
        val inserts = stagedMeta.join(
          cur.select(businessKeys.map(col): _*), businessKeys, "left_anti")
        val closedTodayKeys = hist
          .filter(col("end_date") === lit(clock.today))
          .select(businessKeys.map(col): _*)
          .unionByName(closed.select(businessKeys.map(col): _*))
        val reopened = stagedMeta
          .join(closedTodayKeys, businessKeys, "left_semi")
          .distinct()
        hist.unionByName(closed)
          .unionByName(unchanged)
          .unionByName(inserts)
          .unionByName(reopened)
    }
  }

  // ------------------------------------------------------- bucketed merge

  /** Stable hash bucket of the business key, used as the dimension table's
    * physical partition column for [[mergeBucketed]].
    *
    * LAYOUT CONTRACT (v2): the NULL-key sentinel is U+0001 (v1 used '',
    * which collided with genuinely-empty string keys — harmless for pure
    * routing, but ambiguous). `_bucket` is a PERSISTED partition column,
    * so changing the sentinel changes where NULL-business-key rows
    * physically live: an incremental merge against a v1-layout table
    * would prune to the wrong partition slice and re-insert an
    * already-current key (two current versions). Tables stamp their
    * layout version on initial load and [[mergeBucketed]] refuses to
    * merge into a table stamped with a different (or missing) version —
    * pre-existing v1 tables must be rebuilt (one read + initial-load
    * write), not merged into.
    */
  val BucketLayoutVersion = 2
  private val LayoutVersionFile = "_scd2_bucket_layout"

  private def layoutPath(tablePath: String) =
    new org.apache.hadoop.fs.Path(tablePath, LayoutVersionFile)

  private def stampLayout(fs: org.apache.hadoop.fs.FileSystem,
                          tablePath: String): Unit = {
    val out = fs.create(layoutPath(tablePath), true)
    try out.write(BucketLayoutVersion.toString.getBytes("UTF-8"))
    finally out.close()
  }

  private def checkLayout(fs: org.apache.hadoop.fs.FileSystem,
                          tablePath: String): Unit = {
    val p = layoutPath(tablePath)
    val found =
      if (!fs.exists(p)) "absent (pre-v2 table)"
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      }
    require(found == BucketLayoutVersion.toString,
      s"mergeBucketed: $tablePath has bucket layout version $found, this " +
        s"code writes v$BucketLayoutVersion (NULL-key sentinel changed). " +
        "Incremental merge would prune the wrong partition slice; rebuild " +
        "the table (read + initial load) to migrate.")
  }

  /** Whether `tablePath` already holds a stamped bucketed SCD2 store.
    * Callers' auto dials use this as a STICKY check — once a dimension is
    * bucketed it stays bucketed (flapping between physical layouts would
    * re-shuffle the whole dimension on every flip).
    */
  def isBucketedStore(spark: org.apache.spark.sql.SparkSession,
                      tablePath: String): Boolean = {
    val p = layoutPath(tablePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Migrate an EXISTING dimension (with its full SCD2 history) into the
    * bucketed layout: one read + one partitioned write + layout stamp —
    * the rebuild the layout contract prescribes. Later [[mergeBucketed]]
    * calls then rewrite only affected buckets.
    */
  def seedBucketed(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                   dim: DataFrame, businessKeys: Seq[String],
                   nBuckets: Int = 256): Unit = {
    // explicit width: a bare repartition(col) lets AQE coalesce the
    // layout exchange to a couple of tasks that then emit the ~256 bucket
    // files serially; pinning the count keeps writers wide while the
    // bucket hash still lands each directory's rows in one task
    dim.withColumn("_bucket", keyBucket(businessKeys, nBuckets))
      .repartition(spark.sparkContext.defaultParallelism, col("_bucket"))
      .write.partitionBy("_bucket").mode("overwrite").parquet(tablePath)
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    stampLayout(fs, tablePath)
  }

  def keyBucket(businessKeys: Seq[String], nBuckets: Int): Column =
    pmod(xxhash64(businessKeys.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*),
      lit(nBuckets)).cast("int")

  /** The 100 TB SCD2 merge: the dimension lives partitioned by
    * `_bucket = keyBucket(businessKeys)`; a merge
    *  1. computes the staged delta's affected buckets (distinct over the
    *     delta — tiny, collected to the driver),
    *  2. reads ONLY those partitions of the target (metadata-level
    *     partition pruning),
    *  3. runs the ordinary [[applyScdType2Merge]] on that slice,
    *  4. rewrites ONLY those partitions via dynamic partition overwrite.
    * Untouched buckets keep their files byte-for-byte (asserted in
    * Scd2Spec), so merge cost scales with the delta, not the dimension:
    * a 1% daily churn on a 10 TB dimension rewrites ~1% of it.
    */
  def mergeBucketed(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                    staged: DataFrame, businessKeys: Seq[String],
                    trackedCols: Seq[String], clock: ScdClock,
                    nBuckets: Int = 256): Unit = {
    val bucket = keyBucket(businessKeys, nBuckets)
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // initial load iff the table has no content yet (a bare pre-created
    // directory counts as absent)
    val exists = {
      val p = new org.apache.hadoop.fs.Path(tablePath)
      fs.exists(p) && fs.listStatus(p).exists(s =>
        s.getPath.getName.startsWith("_bucket="))
    }
    if (!exists) {
      applyScdType2Merge(None, staged, businessKeys, trackedCols, clock)
        .withColumn("_bucket", bucket)
        // one file per bucket directory; explicit width so AQE cannot
        // serialize the 256-file emit into a couple of tasks
        .repartition(spark.sparkContext.defaultParallelism, col("_bucket"))
        .write.partitionBy("_bucket").mode("overwrite").parquet(tablePath)
      stampLayout(fs, tablePath)
    } else {
      checkLayout(fs, tablePath) // refuse cross-layout incremental merges
      val affected = staged.select(bucket.as("_bucket")).distinct()
        .collect().map(_.getInt(0)).sorted
      val slice = spark.read.parquet(tablePath)
        .filter(col("_bucket").isin(
          affected.toIndexedSeq.map(Integer.valueOf): _*))
        .drop("_bucket")
      val merged = applyScdType2Merge(Some(slice), staged,
          businessKeys, trackedCols, clock)
        .withColumn("_bucket", bucket)
        // one file per rewritten bucket, writers kept wide (see above)
        .repartition(spark.sparkContext.defaultParallelism, col("_bucket"))
      // per-WRITE dynamic mode (not a session conf set/restore): merges
      // run concurrently across dims — a racing restore would flip a
      // sibling's overwrite to static and wipe its untouched buckets
      merged.write.partitionBy("_bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(tablePath)
    }
  }

  /** SCD2 merge with the dimension stored as a [[TableLog]] table: read the
    * tip snapshot, merge, commit the result as one new version.
    *
    * This is the cleanest answer to the merge-reads-its-own-target problem
    * that forces catalog-table dims through a staged `__prev` swap
    * ([[graft.faers.Pipeline]]): TableLog data files are immutable, so the
    * overwrite WRITES new files while READING old ones — no swap, and a
    * crash at any point leaves the previous version authoritative because
    * the new manifest either committed or didn't. Bonus: every merge is a
    * retained version, so the whole DIMENSION STATE is time-travelable
    * (table granularity) on top of SCD2's own row-level validity
    * intervals. Returns the committed version.
    */
  def mergeLogged(spark: org.apache.spark.sql.SparkSession, dir: String,
                  staged: DataFrame, businessKeys: Seq[String],
                  trackedCols: Seq[String], clock: ScdClock): Long = {
    val target =
      if (TableLog.versions(spark, dir).nonEmpty) Some(TableLog.read(spark, dir))
      else None
    TableLog.overwrite(spark, dir,
      applyScdType2Merge(target, staged, businessKeys, trackedCols, clock))
  }

  /** Current-rows read API implied by the reference's (dead) imports of
    * `get_current_records` (dim_patient.py:162-184; SURVEY.md §7.5).
    */
  def currentRecords(dim: DataFrame): DataFrame = dim.filter(col("is_current"))

  /** Version history for one business key, oldest first. */
  def changeHistory(dim: DataFrame, businessKeys: Seq[String],
                    keyValues: Seq[Any]): DataFrame =
    businessKeys.zip(keyValues)
      .foldLeft(dim) { case (d, (k, v)) => d.filter(col(k) === lit(v)) }
      .orderBy(col("effective_date").asc, col("is_current").asc)
}
