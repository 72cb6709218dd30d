package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** DIRECT oracle gate for the 9-join fact assembly
  * ([[graft.faers.gold.FactAdverseEvents]], mirroring
  * /root/reference/src/gold/facts/fact_adverse_events.py:58-190) — the
  * join-heaviest surface in the repo, previously gated only transitively
  * (PipelineSpec + the analytics reports read its output).
  *
  * The gate feeds the REAL `FactAdverseEvents.create` with silver inputs
  * derived DETERMINISTICALLY from the TPC-H tables (so the DuckDB oracle
  * can rebuild byte-identical inputs in SQL), then hash-gates the full
  * ~52-column output: keys, measures, all 14 flags, the three role-played
  * date decorations, derived scores and tiers. The input design exercises
  * every join multiplicity where fan-out bugs hide:
  *
  *  - J1 reactions⋈drugs: 2 reactions/case × N drugs/case — the
  *    deliberate grain explosion (drug×reaction per report);
  *  - J2 ⋈demographics: exactly 1 row/case (inner);
  *  - J3 ⋈indications: 3-key join (incl. drug_seq), ~half the drugs match
  *    (left-join nulls → 'Unknown' coalesce + has_indication_data=false);
  *  - J4 ⋈therapy: 3-key left, 2/3 of drugs match, all 5 dur_cod branches
  *    including the preserved DAY/DY reference quirk;
  *  - J5 ⋈outcomes: 0, 1 or 2 rows/case — the left FAN-OUT multiplicity
  *    (caseid%3 one outcome, caseid%9 a second);
  *  - J6 ⋈reports: 0..1 rows/case (caseid%4==1 missing → null flags);
  *  - J7 dim_date ×3 roles: real [[graft.faers.gold.DimDate]] spine;
  *    caseid%7 null event dates and caseid%11 null report dates exercise
  *    unmatched keys through every date-derived column.
  *
  * Excluded columns: `fact_created_ts`/`fact_created_date` only
  * (current_timestamp — nondeterministic by definition).
  */
object FaersFactOps {

  type Q = (SparkSession, String) => DataFrame

  /** Case universe: every 20th order; o_custkey drives patient attrs. */
  private def cases(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey").as("caseid"), col("o_custkey"))

  private def demographics(s: SparkSession, d: String): DataFrame =
    cases(s, d)
      .withColumn("age", (col("o_custkey") % 90 + 5).cast("int"))
      .withColumn("sex", when(col("caseid") % 2 === 0, "F").otherwise("M"))
      .withColumn("wt", (col("o_custkey") % 120 + 40).cast("double"))
      .withColumn("age_group",
        when(col("age") < 18, "Pediatric")
          .when(col("age") >= 65, "Elderly").otherwise("Adult"))
      .withColumn("reporter_country",
        when(col("o_custkey") % 5 === 0, "US")
          .when(col("o_custkey") % 5 === 1, "GB")
          .when(col("o_custkey") % 5 === 2, "DE")
          .when(col("o_custkey") % 5 === 3, "FR").otherwise("JP"))
      .withColumn("event_dt",
        when(col("caseid") % 7 === 0, lit(null).cast("date"))
          .otherwise(date_add(to_date(lit("2014-02-01")),
            (col("caseid") % 700).cast("int"))))
      .withColumn("rept_dt",
        when(col("caseid") % 11 === 0, lit(null).cast("date"))
          .otherwise(date_add(col("event_dt"), (col("caseid") % 15).cast("int"))))
      .withColumn("fda_dt", date_add(col("rept_dt"), (col("o_custkey") % 10).cast("int")))
      .withColumn("init_fda_dt", col("fda_dt"))
      .withColumn("primary_id", col("caseid"))
      .drop("o_custkey")

  private def drugs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_orderkey") % 20 === 0)
      .select(
        col("l_orderkey").as("primary_id"), col("l_orderkey").as("caseid"),
        col("l_linenumber").cast("int").as("drug_seq"),
        concat(lit("DRUG_"), (col("l_partkey") % 50).cast("string")).as("drugname"),
        when(col("l_linenumber") % 3 === 1, "PS").otherwise("SS").as("role_cod"),
        col("l_quantity").cast("double").as("dose_amt"),
        when(col("l_suppkey") % 3 === 0, "Oral")
          .when(col("l_suppkey") % 3 === 1, "IV").otherwise("Topical").as("route"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"))

  private def reactions(s: SparkSession, d: String): DataFrame =
    cases(s, d).select(col("caseid"),
        explode(array(lit(1), lit(2))).as("r"))
      .select(
        col("caseid").as("primary_id"), col("caseid"),
        concat(lit("REACT_"), ((col("caseid") + col("r")) % 30).cast("string")).as("pt"),
        when((col("caseid") + col("r")) % 4 === 0, "RA")
          .otherwise(lit(null).cast("string")).as("drug_rec_act"),
        when(col("r") === 1, "Cardiac").otherwise("Neurological").as("reaction_category"),
        when((col("caseid") + col("r")) % 5 === 0, "Life-threatening")
          .otherwise("Moderate").as("severity_classification"),
        ((col("caseid") + col("r")) % 10).cast("double").as("reaction_priority_score"))

  private def indications(s: SparkSession, d: String): DataFrame =
    drugs(s, d).filter(col("drug_seq") % 2 === 1)
      .select(col("primary_id"), col("caseid"),
        col("drug_seq").as("indi_drug_seq"),
        concat(lit("INDI_"), (col("l_partkey") % 20).cast("string")).as("indi_pt"))

  private def therapy(s: SparkSession, d: String): DataFrame =
    drugs(s, d).filter(col("drug_seq") % 3 =!= 0)
      .select(col("primary_id"), col("caseid"),
        col("drug_seq").as("dsg_drug_seq"),
        date_add(to_date(lit("2014-03-01")), (col("l_partkey") % 200).cast("int")).as("start_dt"),
        date_add(date_add(to_date(lit("2014-03-01")), (col("l_partkey") % 200).cast("int")),
          col("l_quantity").cast("int")).as("end_dt"),
        col("l_quantity").cast("int").as("dur"),
        when(col("l_suppkey") % 5 === 0, "DAY")
          .when(col("l_suppkey") % 5 === 1, "WK")
          .when(col("l_suppkey") % 5 === 2, "MON")
          .when(col("l_suppkey") % 5 === 3, "YR").otherwise("DY").as("dur_cod"))

  private def outcomes(s: SparkSession, d: String): DataFrame = {
    val c = cases(s, d)
    c.filter(col("caseid") % 3 === 0).select(
        col("caseid").as("primary_id"), col("caseid"),
        lit("HO").as("outc_cod"), lit("Hospitalization").as("outcome_description"),
        lit(3).as("outcome_severity_rank"), lit("Serious").as("outcome_category"))
      .unionByName(c.filter(col("caseid") % 9 === 0).select(
        col("caseid").as("primary_id"), col("caseid"),
        lit("DE").as("outc_cod"), lit("Death").as("outcome_description"),
        lit(5).as("outcome_severity_rank"), lit("Fatal").as("outcome_category")))
  }

  private def reports(s: SparkSession, d: String): DataFrame =
    cases(s, d).filter(col("caseid") % 4 =!= 1)
      .select(col("caseid").as("primary_id"), col("caseid"),
        when(col("o_custkey") % 3 === 0, "HP")
          .when(col("o_custkey") % 3 === 1, "CSM").otherwise("OTH").as("rpsr_cod"),
        when(col("o_custkey") % 3 === 0, "Healthcare Professional")
          .otherwise("Consumer").as("reporter_source_description"),
        (col("o_custkey") % 5 + 1).cast("int").as("reporter_reliability_score"),
        when(col("o_custkey") % 6 === 0, "High").otherwise("Standard").as("regulatory_priority"))

  def faersFact: Q = (s, d) => {
    val dimDate = graft.faers.gold.DimDate.create(s, "2014-01-01", "2016-12-31",
      Some(java.sql.Date.valueOf("2015-06-15")))
    val fact = graft.faers.gold.FactAdverseEvents.create(
      demographics(s, d), drugs(s, d).drop("l_partkey", "l_suppkey", "l_quantity"),
      reactions(s, d), indications(s, d), therapy(s, d),
      outcomes(s, d), reports(s, d), dimDate)
    fact.select(
      col("event_date_key").cast("string").as("event_date_key"),
      col("report_date_key").cast("string").as("report_date_key"),
      col("fda_received_date_key").cast("string").as("fda_received_date_key"),
      col("report_primary_id"), col("report_case_id"),
      col("drug_sequence_number"),
      col("reaction_preferred_term"), col("indication_preferred_term"),
      col("outcome_code"),
      col("reaction_severity_score").cast("double").as("reaction_severity_score"),
      col("outcome_severity_rank"), col("reporter_reliability_score"),
      col("patient_age"),
      col("patient_weight").cast("double").as("patient_weight"),
      col("drug_dose_amount").cast("double").as("drug_dose_amount"),
      col("therapy_duration_days"),
      col("is_primary_suspect_drug"), col("is_life_threatening_reaction"),
      col("is_fatal_outcome"), col("is_female_patient"),
      col("is_pediatric_case"), col("is_elderly_case"),
      col("is_healthcare_professional_report"), col("has_drug_action_taken"),
      col("has_indication_data"), col("has_therapy_duration"),
      col("has_outcome_data"), col("has_event_date"),
      col("has_report_date"), col("has_fda_received_date"),
      col("reaction_category"), col("outcome_category"),
      col("patient_age_group"), col("reporter_country"),
      col("regulatory_priority"), col("administration_route"),
      col("drug_name"),
      col("adverse_event_date").cast("string").as("adverse_event_date"),
      col("therapy_start_date").cast("string").as("therapy_start_date"),
      col("therapy_end_date").cast("string").as("therapy_end_date"),
      col("event_occurrence_year"), col("event_occurrence_quarter"),
      col("event_occurrence_year_quarter"), col("event_reporting_period"),
      col("report_submission_year"), col("report_submission_quarter"),
      col("fda_processing_year"),
      col("days_event_to_report"), col("days_report_to_fda"),
      col("days_event_to_fda_receipt"),
      col("data_quality_tier"),
      col("clinical_risk_score").cast("double").as("clinical_risk_score"),
      col("case_complexity"))
  }

  /** DuckDB rebuild of the exact same inputs + 9-join + projection. */
  val faersFactSql: String =
    """WITH cases AS (
      |  SELECT o_orderkey AS caseid, o_custkey FROM orders WHERE o_orderkey % 20 = 0),
      |demo AS (
      |  SELECT caseid, o_custkey,
      |    CAST(o_custkey % 90 + 5 AS INTEGER) AS age,
      |    CASE WHEN caseid % 2 = 0 THEN 'F' ELSE 'M' END AS sex,
      |    CAST(o_custkey % 120 + 40 AS DOUBLE) AS wt,
      |    CASE WHEN o_custkey % 90 + 5 < 18 THEN 'Pediatric'
      |         WHEN o_custkey % 90 + 5 >= 65 THEN 'Elderly' ELSE 'Adult' END AS age_group,
      |    CASE o_custkey % 5 WHEN 0 THEN 'US' WHEN 1 THEN 'GB' WHEN 2 THEN 'DE'
      |         WHEN 3 THEN 'FR' ELSE 'JP' END AS reporter_country,
      |    CASE WHEN caseid % 7 = 0 THEN NULL
      |         ELSE DATE '2014-02-01' + CAST(caseid % 700 AS INTEGER) END AS event_dt
      |  FROM cases),
      |demo2 AS (
      |  SELECT *, CASE WHEN caseid % 11 = 0 THEN NULL
      |    ELSE event_dt + CAST(caseid % 15 AS INTEGER) END AS rept_dt FROM demo),
      |demo3 AS (
      |  SELECT *, rept_dt + CAST(o_custkey % 10 AS INTEGER) AS fda_dt FROM demo2),
      |drug AS (
      |  SELECT l_orderkey AS caseid, CAST(l_linenumber AS INTEGER) AS drug_seq,
      |    'DRUG_' || CAST(l_partkey % 50 AS VARCHAR) AS drugname,
      |    CASE WHEN l_linenumber % 3 = 1 THEN 'PS' ELSE 'SS' END AS role_cod,
      |    CAST(l_quantity AS DOUBLE) AS dose_amt,
      |    CASE l_suppkey % 3 WHEN 0 THEN 'Oral' WHEN 1 THEN 'IV'
      |         ELSE 'Topical' END AS route,
      |    l_partkey, l_suppkey, l_quantity
      |  FROM lineitem WHERE l_orderkey % 20 = 0),
      |reac AS (
      |  SELECT caseid,
      |    'REACT_' || CAST((caseid + r) % 30 AS VARCHAR) AS pt,
      |    CASE WHEN (caseid + r) % 4 = 0 THEN 'RA' ELSE NULL END AS drug_rec_act,
      |    CASE WHEN r = 1 THEN 'Cardiac' ELSE 'Neurological' END AS reaction_category,
      |    CASE WHEN (caseid + r) % 5 = 0 THEN 'Life-threatening'
      |         ELSE 'Moderate' END AS severity_classification,
      |    CAST((caseid + r) % 10 AS DOUBLE) AS reaction_priority_score
      |  FROM cases CROSS JOIN (SELECT 1 AS r UNION ALL SELECT 2) rr),
      |indi AS (
      |  SELECT caseid, drug_seq,
      |    'INDI_' || CAST(l_partkey % 20 AS VARCHAR) AS indi_pt
      |  FROM drug WHERE drug_seq % 2 = 1),
      |ther AS (
      |  SELECT caseid, drug_seq,
      |    DATE '2014-03-01' + CAST(l_partkey % 200 AS INTEGER) AS start_dt,
      |    DATE '2014-03-01' + CAST(l_partkey % 200 AS INTEGER)
      |      + CAST(l_quantity AS INTEGER) AS end_dt,
      |    CAST(l_quantity AS INTEGER) AS dur,
      |    CASE l_suppkey % 5 WHEN 0 THEN 'DAY' WHEN 1 THEN 'WK' WHEN 2 THEN 'MON'
      |         WHEN 3 THEN 'YR' ELSE 'DY' END AS dur_cod
      |  FROM drug WHERE drug_seq % 3 <> 0),
      |outc AS (
      |  SELECT caseid, 'HO' AS outc_cod, CAST(3 AS INTEGER) AS outcome_severity_rank,
      |    'Serious' AS outcome_category
      |  FROM cases WHERE caseid % 3 = 0
      |  UNION ALL
      |  SELECT caseid, 'DE', 5, 'Fatal' FROM cases WHERE caseid % 9 = 0),
      |rep AS (
      |  SELECT caseid,
      |    CASE WHEN o_custkey % 3 = 0 THEN 'Healthcare Professional'
      |         ELSE 'Consumer' END AS reporter_source_description,
      |    CAST(o_custkey % 5 + 1 AS INTEGER) AS reporter_reliability_score,
      |    CASE WHEN o_custkey % 6 = 0 THEN 'High' ELSE 'Standard' END AS regulatory_priority
      |  FROM cases WHERE caseid % 4 <> 1),
      |dd AS (
      |  SELECT CAST(unnest(generate_series(DATE '2014-01-01', DATE '2016-12-31',
      |    INTERVAL 1 DAY)) AS DATE) AS dv),
      |dda AS (
      |  SELECT dv, CAST(year(dv) AS INTEGER) AS yr,
      |    CAST(quarter(dv) AS INTEGER) AS qtr, CAST(month(dv) AS INTEGER) AS mon,
      |    CAST(year(dv) AS VARCHAR) || '-Q' || CAST(quarter(dv) AS VARCHAR) AS yq,
      |    CASE WHEN year(dv) <= 2015 THEN '2010-2015' ELSE '2016-2020' END AS rp
      |  FROM dd)
      |SELECT
      |  CAST(e.dv AS VARCHAR) AS event_date_key,
      |  CAST(r2.dv AS VARCHAR) AS report_date_key,
      |  CAST(f.dv AS VARCHAR) AS fda_received_date_key,
      |  reac.caseid AS report_primary_id,
      |  reac.caseid AS report_case_id,
      |  drug.drug_seq AS drug_sequence_number,
      |  reac.pt AS reaction_preferred_term,
      |  coalesce(indi.indi_pt, 'Unknown') AS indication_preferred_term,
      |  coalesce(outc.outc_cod, 'Unknown') AS outcome_code,
      |  reac.reaction_priority_score AS reaction_severity_score,
      |  coalesce(outc.outcome_severity_rank, 0) AS outcome_severity_rank,
      |  coalesce(rep.reporter_reliability_score, 1) AS reporter_reliability_score,
      |  demo3.age AS patient_age,
      |  demo3.wt AS patient_weight,
      |  drug.dose_amt AS drug_dose_amount,
      |  CAST(CASE ther.dur_cod WHEN 'DAY' THEN ther.dur WHEN 'WK' THEN ther.dur * 7
      |       WHEN 'MON' THEN ther.dur * 30 WHEN 'YR' THEN ther.dur * 365
      |       ELSE ther.dur END AS INTEGER) AS therapy_duration_days,
      |  drug.role_cod = 'PS' AS is_primary_suspect_drug,
      |  reac.severity_classification = 'Life-threatening' AS is_life_threatening_reaction,
      |  outc.outcome_category = 'Fatal' AS is_fatal_outcome,
      |  demo3.sex = 'F' AS is_female_patient,
      |  demo3.age < 18 AS is_pediatric_case,
      |  demo3.age >= 65 AS is_elderly_case,
      |  rep.reporter_source_description = 'Healthcare Professional'
      |    AS is_healthcare_professional_report,
      |  reac.drug_rec_act IS NOT NULL AS has_drug_action_taken,
      |  indi.indi_pt IS NOT NULL AS has_indication_data,
      |  ther.dur IS NOT NULL AS has_therapy_duration,
      |  outc.outc_cod IS NOT NULL AS has_outcome_data,
      |  e.dv IS NOT NULL AS has_event_date,
      |  r2.dv IS NOT NULL AS has_report_date,
      |  f.dv IS NOT NULL AS has_fda_received_date,
      |  reac.reaction_category,
      |  outc.outcome_category,
      |  demo3.age_group AS patient_age_group,
      |  demo3.reporter_country,
      |  rep.regulatory_priority,
      |  drug.route AS administration_route,
      |  drug.drugname AS drug_name,
      |  CAST(demo3.event_dt AS VARCHAR) AS adverse_event_date,
      |  CAST(ther.start_dt AS VARCHAR) AS therapy_start_date,
      |  CAST(ther.end_dt AS VARCHAR) AS therapy_end_date,
      |  e.yr AS event_occurrence_year,
      |  e.qtr AS event_occurrence_quarter,
      |  e.yq AS event_occurrence_year_quarter,
      |  e.rp AS event_reporting_period,
      |  r2.yr AS report_submission_year,
      |  r2.qtr AS report_submission_quarter,
      |  f.yr AS fda_processing_year,
      |  CAST(date_diff('day', e.dv, r2.dv) AS INTEGER) AS days_event_to_report,
      |  CAST(date_diff('day', r2.dv, f.dv) AS INTEGER) AS days_report_to_fda,
      |  CAST(date_diff('day', e.dv, f.dv) AS INTEGER) AS days_event_to_fda_receipt,
      |  CASE WHEN demo3.event_dt IS NULL OR reac.pt IS NULL OR drug.drugname IS NULL
      |         THEN 'Poor'
      |       WHEN indi.indi_pt IS NULL OR ther.dur IS NULL OR outc.outc_cod IS NULL
      |         THEN 'Moderate'
      |       ELSE 'Good' END AS data_quality_tier,
      |  (reac.reaction_priority_score * CAST(0.4 AS DOUBLE))
      |    + (coalesce(outc.outcome_severity_rank, 0) * CAST(0.3 AS DOUBLE))
      |    + ((CASE WHEN reac.severity_classification = 'Life-threatening' THEN 3
      |         ELSE 0 END) * CAST(0.2 AS DOUBLE))
      |    + ((CASE WHEN outc.outcome_category = 'Fatal' THEN 5 ELSE 0 END)
      |        * CAST(0.1 AS DOUBLE)) AS clinical_risk_score,
      |  CASE WHEN indi.indi_pt IS NOT NULL AND ther.dur IS NOT NULL
      |         AND outc.outc_cod IS NOT NULL
      |         AND rep.reporter_source_description = 'Healthcare Professional'
      |         THEN 'High'
      |       WHEN indi.indi_pt IS NOT NULL AND outc.outc_cod IS NOT NULL THEN 'Medium'
      |       ELSE 'Low' END AS case_complexity
      |FROM reac
      |JOIN drug ON drug.caseid = reac.caseid
      |JOIN demo3 ON demo3.caseid = reac.caseid
      |LEFT JOIN indi ON indi.caseid = reac.caseid AND indi.drug_seq = drug.drug_seq
      |LEFT JOIN ther ON ther.caseid = reac.caseid AND ther.drug_seq = drug.drug_seq
      |LEFT JOIN outc ON outc.caseid = reac.caseid
      |LEFT JOIN rep ON rep.caseid = reac.caseid
      |LEFT JOIN dda e ON demo3.event_dt = e.dv
      |LEFT JOIN dda r2 ON demo3.rept_dt = r2.dv
      |LEFT JOIN dda f ON demo3.fda_dt = f.dv""".stripMargin

  val queries: Map[String, Q] = Map("q_faers_fact" -> faersFact)
  val oracles: Map[String, String] = Map("q_faers_fact" -> faersFactSql)
}
