package graft.queries

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Date/time scalar family, date-range generation, and window functions
  * (SURVEY.md §2.8 date family + §2.5).
  *
  * The reference's dim_date builds a calendar via
  * `explode(sequence(to_date(..), to_date(..), interval 1 day))`
  * (reference: src/gold/dims/dim_date.py:40-107) and decorates it with
  * year/month/quarter/weekday attributes; FAERS dates arrive as 8/6/4-digit
  * strings repaired via length dispatch
  * (reference: src/utils/silver_transformations.py:48-71).
  */
object Temporal {

  type Q = (SparkSession, String) => DataFrame

  /** §2.8 date family over orders: extract/format/diff/last_day. */
  def scalarDate: Q = (s, d) => {
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        quarter(col("o_orderdate")).as("order_quarter"),
        dayofmonth(col("o_orderdate")).as("order_dom"),
        dayofweek(col("o_orderdate")).as("order_dow"),
        dayofyear(col("o_orderdate")).as("order_doy"),
        weekofyear(col("o_orderdate")).as("order_week"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_ym"),
        datediff(lit(Date.valueOf("2002-01-01")), col("o_orderdate")).as("days_to_2002"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy(col("o_orderkey"))
  }

  /** DuckDB parity notes: dayofweek is 0=Sunday there vs 1=Sunday in Spark;
    * weekofyear maps to ISO weekofyear in both; last_day returns DATE.
    */
  val scalarDateSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
      |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS order_dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
      |  CAST(dayofyear(o_orderdate) AS INTEGER) AS order_doy,
      |  CAST(weekofyear(o_orderdate) AS INTEGER) AS order_week,
      |  strftime(o_orderdate, '%Y-%m') AS order_ym,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Generator: explode(sequence(date, date, interval 1 day)) — the
    * reference's calendar-spine builder (dim_date.py:40-47), rolled up to
    * month grain so the result is stable and small.
    */
  def dateSpine: Q = (s, _) => {
    s.range(1)
      .select(explode(sequence(
        lit(Date.valueOf("2024-01-01")),
        lit(Date.valueOf("2024-12-31")),
        expr("interval 1 day"))).as("d"))
      .groupBy(year(col("d")).as("y"), month(col("d")).as("m"))
      .agg(count(lit(1)).as("n_days"),
        date_format(min(col("d")), "yyyy-MM-dd").as("first_day"),
        date_format(max(col("d")), "yyyy-MM-dd").as("last_day"))
      .orderBy(col("y"), col("m"))
  }

  val dateSpineSql: String =
    """SELECT CAST(year(d) AS INTEGER) AS y, CAST(month(d) AS INTEGER) AS m,
      |  count(*) AS n_days, strftime(min(d), '%Y-%m-%d') AS first_day, strftime(max(d), '%Y-%m-%d') AS last_day
      |FROM (SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY)) AS DATE) AS d)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** §2.5 window: latest event per user (row_number dedup-by-recency — the
    * idiomatic rewrite of SCD "current row" selection).
    */
  def latestEventPerUser: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  val latestEventPerUserSql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** §2.5 window: rank + lag within partition (running analytics shape). */
  def eventValueLag: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .filter(col("event_type") === "click")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("seq", row_number().over(w))
      .select(col("user_id"), col("event_id"), col("value"), col("prev_value"), col("seq"))
      .orderBy(col("user_id"), col("seq"))
  }

  val eventValueLagSql: String =
    """SELECT user_id, event_id, value, prev_value, CAST(seq AS INTEGER) AS seq FROM (
      |  SELECT user_id, event_id, value,
      |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS seq
      |  FROM events WHERE event_type = 'click')
      |ORDER BY user_id, seq""".stripMargin

  /** FAERS 8/6/4-digit date repair (silver_transformations.py:48-71) applied
    * to synthetic string dates derived from o_orderdate so the oracle can
    * reproduce the same input.
    */
  def dateRepair: Q = (s, d) => {
    val raw = Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        // derive a deterministic mix of 8/6/4-digit and invalid strings
        when(col("o_orderkey") % 10 < 6, date_format(col("o_orderdate"), "yyyyMMdd"))
          .when(col("o_orderkey") % 10 < 8, date_format(col("o_orderdate"), "yyyyMM"))
          .when(col("o_orderkey") % 10 === 8, date_format(col("o_orderdate"), "yyyy"))
          .otherwise(lit("invalid")).as("dt_str"))
    graft.faers.Transforms.repairFaersDate(raw, "dt_str", "dt")
      .select(col("o_orderkey"), col("dt_str"),
        date_format(col("dt"), "yyyy-MM-dd").as("dt"))
      .orderBy(col("o_orderkey"))
  }

  val dateRepairSql: String =
    """WITH raw AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 10 < 6 THEN strftime(o_orderdate, '%Y%m%d')
      |         WHEN o_orderkey % 10 < 8 THEN strftime(o_orderdate, '%Y%m')
      |         WHEN o_orderkey % 10 = 8 THEN strftime(o_orderdate, '%Y')
      |         ELSE 'invalid' END AS dt_str
      |  FROM orders)
      |SELECT o_orderkey, dt_str,
      |  strftime(CASE WHEN length(dt_str) = 8 THEN try_strptime(dt_str, '%Y%m%d')::DATE
      |       WHEN length(dt_str) = 6 THEN try_strptime(dt_str || '01', '%Y%m%d')::DATE
      |       WHEN length(dt_str) = 4 THEN try_strptime(dt_str || '0101', '%Y%m%d')::DATE
      |       ELSE NULL END, '%Y-%m-%d') AS dt
      |FROM raw ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_scalar_date" -> scalarDate,
    "q_date_spine" -> dateSpine,
    "q_window_latest_event" -> latestEventPerUser,
    "q_window_lag" -> eventValueLag,
    "q_date_repair" -> dateRepair,
  )

  val oracles: Map[String, String] = Map(
    "q_scalar_date" -> scalarDateSql,
    "q_date_spine" -> dateSpineSql,
    "q_window_latest_event" -> latestEventPerUserSql,
    "q_window_lag" -> eventValueLagSql,
    "q_date_repair" -> dateRepairSql,
  )
}
