package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Scd2, ScdClock, Tables}

/** SCD Type 2 merge scenario, oracle-checked end to end (the reference's
  * one genuinely non-built-in operator, SURVEY.md §2.1 S8/J8/J9).
  *
  * Scenario (fixed clocks so every output cell is deterministic):
  *  - T0 = 2024-01-15: initial dimension load from `customer`
  *    (bk = c_custkey; tracked attrs = c_name, c_mktsegment).
  *  - T1 = 2024-06-01: a new snapshot arrives where every c_custkey % 10 == 0
  *    moved to segment 'MIGRATED', and c_custkey % 13 == 0 spawns a brand-new
  *    key (+1000000).
  *  - Expected: changed keys have a closed historical row
  *    [T0, T1) + an open current row; unchanged keys keep their T0 row;
  *    new keys appear effective T1.
  */
object ScdOps {

  type Q = (SparkSession, String) => DataFrame

  private val T0 = "2024-01-15"
  private val T1 = "2024-06-01"
  private val BK = Seq("c_custkey")
  private val Tracked = Seq("c_name", "c_mktsegment")

  private def snapshot0(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  private def snapshot1(s: SparkSession, d: String): DataFrame = {
    val base = snapshot0(s, d)
    base.select(
        col("c_custkey"),
        col("c_name"),
        when(col("c_custkey") % 10 === 0, lit("MIGRATED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      .unionByName(base.filter(col("c_custkey") % 13 === 0)
        .select(
          (col("c_custkey") + 1000000).as("c_custkey"),
          concat(lit("NEW_"), col("c_custkey").cast("string")).as("c_name"),
          lit("NEWSEG").as("c_mktsegment")))
  }

  def scd2Merge: Q = (s, d) => {
    val initial = Scd2.applyScdType2Merge(
      None, snapshot0(s, d), BK, Tracked, ScdClock.fixed(T0))
    val merged = Scd2.applyScdType2Merge(
      Some(initial), snapshot1(s, d), BK, Tracked, ScdClock.fixed(T1))
    merged.select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("effective_date").cast("string").as("effective_date"),
        col("end_date").cast("string").as("end_date"),
        col("is_current"),
        col("row_hash"), col("surrogate_key"))
      .orderBy(col("c_custkey"), col("effective_date"), col("is_current"))
  }

  val scd2MergeSql: String =
    s"""WITH base AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
      |rows0 AS (
      |  SELECT c_custkey, c_name, c_mktsegment,
      |    DATE '$T0' AS effective_date,
      |    CASE WHEN c_custkey % 10 = 0 THEN DATE '$T1' ELSE NULL END AS end_date,
      |    c_custkey % 10 <> 0 AS is_current
      |  FROM base
      |  UNION ALL
      |  SELECT c_custkey, c_name, 'MIGRATED', DATE '$T1', NULL, true
      |  FROM base WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEW_' || CAST(c_custkey AS VARCHAR), 'NEWSEG',
      |    DATE '$T1', NULL, true
      |  FROM base WHERE c_custkey % 13 = 0)
      |SELECT c_custkey, c_name, c_mktsegment,
      |  CAST(effective_date AS VARCHAR) AS effective_date,
      |  CAST(end_date AS VARCHAR) AS end_date, is_current,
      |  md5(coalesce(c_name, 'NULL') || '||' || coalesce(c_mktsegment, 'NULL')) AS row_hash,
      |  md5(CAST(c_custkey AS VARCHAR) || '||' || CAST(effective_date AS VARCHAR)) AS surrogate_key
      |FROM rows0
      |ORDER BY c_custkey, effective_date, is_current""".stripMargin

  /** The dimension READ API over the merged dim (the reference imports
    * `get_current_records` / `get_change_history` without defining them —
    * dim_patient.py:162-184; here they are real and gated): current-view
    * rollup per segment plus each key's version count. Proves the
    * current-row filter and the per-key version cardinality both see
    * exactly the two-phase merge's output. (`changeHistory` itself is a
    * single-key point lookup — spec-covered in Scd2Spec.)
    */
  def scd2Current: Q = (s, d) => {
    val initial = Scd2.applyScdType2Merge(
      None, snapshot0(s, d), BK, Tracked, ScdClock.fixed(T0))
    val merged = Scd2.applyScdType2Merge(
      Some(initial), snapshot1(s, d), BK, Tracked, ScdClock.fixed(T1))
    val versions = merged
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_versions"))
    Scd2.currentRecords(merged)
      .join(versions, "c_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_current"),
        sum(col("n_versions")).as("sum_versions"),
        min(col("effective_date")).cast("string").as("first_effective"),
        max(col("effective_date")).cast("string").as("last_effective"))
      .orderBy(col("c_mktsegment"))
  }

  val scd2CurrentSql: String =
    s"""WITH base AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
      |rows0 AS (
      |  SELECT c_custkey, c_mktsegment, DATE '$T0' AS effective_date,
      |    c_custkey % 10 <> 0 AS is_current
      |  FROM base
      |  UNION ALL
      |  SELECT c_custkey, 'MIGRATED', DATE '$T1', true
      |  FROM base WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEWSEG', DATE '$T1', true
      |  FROM base WHERE c_custkey % 13 = 0),
      |versions AS (SELECT c_custkey, count(*) AS n_versions
      |  FROM rows0 GROUP BY c_custkey)
      |SELECT c_mktsegment, count(*) AS n_current,
      |  CAST(sum(n_versions) AS BIGINT) AS sum_versions,
      |  CAST(min(effective_date) AS VARCHAR) AS first_effective,
      |  CAST(max(effective_date) AS VARCHAR) AS last_effective
      |FROM rows0 JOIN versions USING (c_custkey)
      |WHERE is_current GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** The AT-SCALE merge path hash-gated end to end: the same T0/T1
    * scenario as [[scd2Merge]], but run through [[Scd2.mergeBucketed]] —
    * dimension persisted partitioned by `_bucket`, delta's affected
    * buckets pruned at metadata level, dynamic partition overwrite, layout
    * stamp. The oracle is IDENTICAL to `q_scd2_merge`'s: the bucketed
    * plumbing must be invisible in the data. (Scd2Spec proves
    * file-level properties — untouched buckets keep their exact files —
    * this gate proves the values at sf scale.)
    */
  def scd2Bucketed: Q = (s, d) => {
    val dir = Scratch.dir("scd2_bucketed_" +
      java.lang.Integer.toHexString(d.hashCode))
    Scratch.wipe(dir)
    Scd2.mergeBucketed(s, dir, snapshot0(s, d), BK, Tracked,
      ScdClock.fixed(T0), nBuckets = 16)
    Scd2.mergeBucketed(s, dir, snapshot1(s, d), BK, Tracked,
      ScdClock.fixed(T1), nBuckets = 16)
    s.read.parquet(dir).drop("_bucket")
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("effective_date").cast("string").as("effective_date"),
        col("end_date").cast("string").as("end_date"),
        col("is_current"),
        col("row_hash"), col("surrogate_key"))
      .orderBy(col("c_custkey"), col("effective_date"), col("is_current"))
  }

  /** POINT-IN-TIME JOIN against the SCD2 history — the feature-store
    * operation that prevents training-serving skew: each event is
    * decorated with the dimension VERSION that was valid at event time
    * (`effective_date ≤ t < end_date`), never the current one. Events are
    * synthesized to straddle both merge clocks: pre-T0 events match no
    * version (the entity didn't exist yet — left-join nulls), T0..T1
    * events resolve to since-closed historical rows for migrated keys,
    * post-T1 events resolve to the current row.
    *
    * SCALE: SCD2 validity intervals are non-overlapping per key, so the
    * lookup is a KEY equi-join with the interval test as residual
    * predicate — fan-out is bounded by versions-per-key (2 here), and the
    * dimension side broadcasts (dims are catalog-sized next to a fact
    * stream). A data-sized dimension switches to the shuffle form on the
    * same key, exactly like [[graft.core.Scd2.mergeBucketed]]'s layout.
    */
  def pitJoin: Q = (s, d) => {
    val initial = Scd2.applyScdType2Merge(
      None, snapshot0(s, d), BK, Tracked, ScdClock.fixed(T0))
    val dim = Scd2.applyScdType2Merge(
        Some(initial), snapshot1(s, d), BK, Tracked, ScdClock.fixed(T1))
      .select(col("c_custkey"), col("c_mktsegment"),
        col("effective_date"), col("end_date"), col("is_current"))
    val events = Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        date_add(to_date(lit("2024-01-01")),
          (col("o_orderkey") % 300).cast("int")).as("event_date"))
    events.join(broadcast(dim),
        col("o_custkey") === col("c_custkey") &&
          col("effective_date") <= col("event_date") &&
          (col("end_date").isNull || col("event_date") < col("end_date")),
        "left")
      .select(col("o_orderkey"), col("o_custkey"),
        col("event_date").cast("string").as("event_date"),
        col("c_mktsegment"),
        col("effective_date").cast("string").as("effective_date"),
        col("is_current"))
      .orderBy(col("o_orderkey"))
  }

  val pitJoinSql: String =
    s"""WITH base AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
      |dim AS (
      |  SELECT c_custkey, c_mktsegment,
      |    DATE '$T0' AS effective_date,
      |    CASE WHEN c_custkey % 10 = 0 THEN DATE '$T1' ELSE NULL END AS end_date,
      |    c_custkey % 10 <> 0 AS is_current
      |  FROM base
      |  UNION ALL
      |  SELECT c_custkey, 'MIGRATED', DATE '$T1', NULL, true
      |  FROM base WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEWSEG', DATE '$T1', NULL, true
      |  FROM base WHERE c_custkey % 13 = 0),
      |events AS (
      |  SELECT o_orderkey, o_custkey,
      |    DATE '2024-01-01' + CAST(o_orderkey % 300 AS INTEGER) AS event_date
      |  FROM orders WHERE o_orderkey % 7 = 0)
      |SELECT o_orderkey, o_custkey,
      |  CAST(event_date AS VARCHAR) AS event_date,
      |  c_mktsegment,
      |  CAST(effective_date AS VARCHAR) AS effective_date,
      |  is_current
      |FROM events LEFT JOIN dim
      |  ON o_custkey = c_custkey
      |  AND effective_date <= event_date
      |  AND (end_date IS NULL OR event_date < end_date)
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_scd2_merge" -> scd2Merge,
    "q_scd2_current" -> scd2Current,
    "q_scd2_bucketed" -> scd2Bucketed,
    "q_pit_join" -> pitJoin)
  val oracles: Map[String, String] = Map(
    "q_scd2_merge" -> scd2MergeSql,
    "q_scd2_current" -> scd2CurrentSql,
    "q_scd2_bucketed" -> scd2MergeSql,
    "q_pit_join" -> pitJoinSql)
}
