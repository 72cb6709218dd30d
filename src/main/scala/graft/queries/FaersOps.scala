package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.faers.Transforms

/** FAERS silver-layer scalar transforms (SURVEY.md §2.8) oracle-checked on
  * deterministic strings derived from the driver tables: dosage parsing,
  * age bucketing, drug-name standardization. (Date repair is covered by
  * q_date_repair in Temporal.)
  */
object FaersOps {

  type Q = (SparkSession, String) => DataFrame

  /** Dose parse from verbatim text — the reference's 3-regex extract
    * (silver_transformations.py:134-163) over synthesized dose strings.
    */
  def doseParse: Q = (s, d) => {
    val raw = Tables.part(s, d).select(
      col("p_partkey"),
      when(col("p_partkey") % 4 === 0,
          concat((col("p_partkey") % 999).cast("string"), lit(" MG, TWICE DAILY")))
        .when(col("p_partkey") % 4 === 1,
          concat((col("p_partkey") % 999).cast("string"), lit("MG")))
        .when(col("p_partkey") % 4 === 2,
          concat((col("p_partkey") % 999).cast("string"), lit(".5 ml, daily")))
        .otherwise(lit("UNKNOWN DOSE")).as("dose_vbm"))
    Transforms.parseDosageInformation(raw)
      .select(col("p_partkey"), col("dose_vbm"), col("dose"),
        col("dose_unit"), col("dose_frequency"))
      .orderBy(col("p_partkey"))
  }

  val doseParseSql: String =
    """WITH raw AS (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 4 = 0 THEN CAST(p_partkey % 999 AS VARCHAR) || ' MG, TWICE DAILY'
      |         WHEN p_partkey % 4 = 1 THEN CAST(p_partkey % 999 AS VARCHAR) || 'MG'
      |         WHEN p_partkey % 4 = 2 THEN CAST(p_partkey % 999 AS VARCHAR) || '.5 ml, daily'
      |         ELSE 'UNKNOWN DOSE' END AS dose_vbm
      |  FROM part)
      |SELECT p_partkey, dose_vbm,
      |  CASE WHEN regexp_extract(dose_vbm, '(\d+\.?\d*)', 1) <> ''
      |       THEN CAST(regexp_extract(dose_vbm, '(\d+\.?\d*)', 1) AS DOUBLE) ELSE NULL END AS dose,
      |  CASE WHEN regexp_extract(dose_vbm, '\d+\.?\d*\s*(\w+)', 1) <> ''
      |       THEN upper(trim(regexp_extract(dose_vbm, '\d+\.?\d*\s*(\w+)', 1))) ELSE '' END AS dose_unit,
      |  CASE WHEN regexp_extract(dose_vbm, ',(.*)', 1) <> ''
      |       THEN upper(trim(regexp_extract(dose_vbm, ',(.*)', 1))) ELSE '' END AS dose_frequency
      |FROM raw ORDER BY p_partkey""".stripMargin

  /** Age bucketing incl. null → Unknown (silver_transformations.py:93-107)
    * over synthetic ages, rolled up to the bucket distribution.
    */
  /** The reference's numeric-standardization gate
    * (silver_transformations.py:83-85): strings matching
    * `^[0-9]+\.?[0-9]*$` cast to double, everything else nulls — the
    * regex deliberately REJECTS negatives, exponents, and leading dots
    * (reference fidelity). Synthesizes a dirty string column from
    * l_quantity (every 7th row suffixed, every 11th negated — both must
    * null out), repairs it, and rolls up survivors/nulls per flag.
    */
  def numericRepair: Q = (s, d) => {
    val dirty = Tables.lineitem(s, d).select(
      col("l_returnflag"),
      when(col("l_orderkey") % 7 === 0,
          concat(col("l_quantity").cast("string"), lit("x")))
        .when(col("l_orderkey") % 11 === 0,
          concat(lit("-"), col("l_quantity").cast("string")))
        .otherwise(col("l_quantity").cast("string")).as("qty_raw"))
    Transforms.standardizeNumericFields(dirty, Seq("qty_raw"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("qty_raw").isNull, 1).otherwise(0)).cast("long").as("n_rejected"),
        sum(col("qty_raw").cast("long")).as("sum_repaired"))
      .orderBy(col("l_returnflag"))
  }

  val numericRepairSql: String =
    """WITH dirty AS (SELECT l_returnflag,
      |    CASE WHEN l_orderkey % 7 = 0 THEN CAST(l_quantity AS VARCHAR) || 'x'
      |         WHEN l_orderkey % 11 = 0 THEN '-' || CAST(l_quantity AS VARCHAR)
      |         ELSE CAST(l_quantity AS VARCHAR) END AS qty_raw
      |  FROM lineitem),
      |fixed AS (SELECT l_returnflag,
      |    CASE WHEN regexp_matches(qty_raw, '^[0-9]+\.?[0-9]*$')
      |         THEN CAST(qty_raw AS DOUBLE) END AS qty
      |  FROM dirty)
      |SELECT l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN qty IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
      |  CAST(sum(CAST(qty AS BIGINT)) AS BIGINT) AS sum_repaired
      |FROM fixed GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def ageGroups: Q = (s, d) => {
    val raw = Tables.customer(s, d).select(
      col("c_custkey"),
      when(col("c_custkey") % 13 === 0, lit(null).cast("double"))
        .otherwise((col("c_custkey") % 107).cast("double")).as("age"))
    Transforms.calculateAgeGroups(raw)
      .groupBy(col("age_group"))
      .agg(count(lit(1)).as("n"),
        Num.roundAt(4)(avg(col("age"))).as("avg_age"))
      .orderBy(col("age_group"))
  }

  val ageGroupsSql: String =
    s"""WITH raw AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 13 = 0 THEN NULL
      |         ELSE CAST(c_custkey % 107 AS DOUBLE) END AS age
      |  FROM customer),
      |g AS (SELECT age,
      |    CASE WHEN age < 18 THEN 'Pediatric (0-17)'
      |         WHEN age >= 18 AND age < 65 THEN 'Adult (18-64)'
      |         WHEN age >= 65 THEN 'Elderly (65+)'
      |         ELSE 'Unknown' END AS age_group
      |  FROM raw)
      |SELECT age_group, count(*) AS n, ${Num.roundAtSql(4, "avg(age)")} AS avg_age
      |FROM g GROUP BY age_group ORDER BY age_group""".stripMargin

  /** Drug-name standardization (silver_transformations.py:119-131) over
    * part names mangled with punctuation/whitespace noise.
    */
  def drugClean: Q = (s, d) => {
    val raw = Tables.part(s, d).select(
      col("p_partkey"),
      concat(lit("  "), col("p_name"), lit("!! (x)")).as("drugname"))
    Transforms.standardizeDrugNames(raw)
      .select(col("p_partkey"), col("drugname"))
      .orderBy(col("p_partkey"))
  }

  val drugCleanSql: String =
    """SELECT p_partkey,
      |  upper(trim(regexp_replace('  ' || p_name || '!! (x)', '[^\w\s]', '', 'g'))) AS drugname
      |FROM part ORDER BY p_partkey""".stripMargin

  /** The gold calendar dimension for one year, fixed clock 2024-06-15 —
    * calendar / fiscal / seasonal / relative attribute decoration
    * (reference: src/gold/dims/dim_date.py:20-161).
    */
  def dimDateAttrs: Q = (s, _) => {
    graft.faers.gold.DimDate.create(s, "2024-01-01", "2024-12-31",
        Some(java.sql.Date.valueOf("2024-06-15")))
      .select(
        col("date_string"), col("year"), col("month"), col("day"),
        col("quarter"), col("week_of_year"), col("day_of_week"),
        col("day_name"), col("month_name"), col("year_quarter"),
        col("year_month"), col("is_weekend"), col("is_last_day_of_month"),
        col("season"), col("fiscal_year"), col("fiscal_quarter"),
        col("days_from_today"), col("is_past"), col("reporting_period"))
      .orderBy(col("date_string"))
  }

  val dimDateAttrsSql: String =
    """WITH spine AS (
      |  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31',
      |    INTERVAL 1 DAY)) AS DATE) AS d)
      |SELECT strftime(d, '%Y-%m-%d') AS date_string,
      |  CAST(year(d) AS INTEGER) AS year,
      |  CAST(month(d) AS INTEGER) AS month,
      |  CAST(dayofmonth(d) AS INTEGER) AS day,
      |  CAST(quarter(d) AS INTEGER) AS quarter,
      |  CAST(weekofyear(d) AS INTEGER) AS week_of_year,
      |  CAST(dayofweek(d) + 1 AS INTEGER) AS day_of_week,
      |  strftime(d, '%A') AS day_name,
      |  strftime(d, '%B') AS month_name,
      |  CAST(year(d) AS VARCHAR) || '-Q' || CAST(quarter(d) AS VARCHAR) AS year_quarter,
      |  CAST(year(d) AS VARCHAR) || '-' || lpad(CAST(month(d) AS VARCHAR), 2, '0') AS year_month,
      |  dayofweek(d) IN (0, 6) AS is_weekend,
      |  d = last_day(d) AS is_last_day_of_month,
      |  CASE WHEN month(d) IN (12, 1, 2) THEN 'Winter'
      |       WHEN month(d) IN (3, 4, 5) THEN 'Spring'
      |       WHEN month(d) IN (6, 7, 8) THEN 'Summer'
      |       ELSE 'Fall' END AS season,
      |  CAST(CASE WHEN month(d) >= 7 THEN year(d) + 1 ELSE year(d) END AS INTEGER) AS fiscal_year,
      |  CAST(CASE WHEN month(d) BETWEEN 7 AND 9 THEN 1
      |       WHEN month(d) BETWEEN 10 AND 12 THEN 2
      |       WHEN month(d) BETWEEN 1 AND 3 THEN 3
      |       ELSE 4 END AS INTEGER) AS fiscal_quarter,
      |  CAST(date_diff('day', DATE '2024-06-15', d) AS INTEGER) AS days_from_today,
      |  d < DATE '2024-06-15' AS is_past,
      |  '2021+' AS reporting_period
      |FROM spine ORDER BY date_string""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_numeric_repair" -> numericRepair,
    "q_dose_parse" -> doseParse,
    "q_age_groups" -> ageGroups,
    "q_drug_clean" -> drugClean,
    "q_dim_date" -> dimDateAttrs,
  )

  val oracles: Map[String, String] = Map(
    "q_numeric_repair" -> numericRepairSql,
    "q_dose_parse" -> doseParseSql,
    "q_age_groups" -> ageGroupsSql,
    "q_drug_clean" -> drugCleanSql,
    "q_dim_date" -> dimDateAttrsSql,
  )
}
