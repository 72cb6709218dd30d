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
