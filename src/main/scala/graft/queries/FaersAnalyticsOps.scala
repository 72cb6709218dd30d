package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.faers.gold.FactAnalytics

/** Oracle gates for the reference's user-facing analytics/report layer
  * (reference: src/gold/analytics/fact_analytics.py:19-255) — the 10 reports
  * a FAERS analyst actually runs. Each q_faers_* entry executes the real
  * [[FactAnalytics]] report over a deterministic synthetic fact derived from
  * `lineitem`, and the oracle SQL reproduces the same fact + aggregation in
  * DuckDB, so every report gets a full rows/schema/hash gate.
  *
  * Determinism notes:
  *  - All score/avg inputs are whole-number-valued doubles, so `avg` =
  *    exact-integer-sum / count is bit-identical across engines and across
  *    cluster sizes (the [[Num]] policy).
  *  - Every top-k report carries its group key as a sort tie-breaker (see
  *    [[FactAnalytics]]) so the selected set at the limit boundary is unique.
  */
object FaersAnalyticsOps {

  type Q = (SparkSession, String) => DataFrame

  /** Synthetic FAERS fact at lineitem grain (one row per drug-reaction per
    * report, mirroring fact_adverse_events.py:34): every attribute is a
    * deterministic function of the TPC-H keys so DuckDB can rebuild it
    * exactly. Pure projection — no shuffle; at 100 TB this is a map-only
    * stage fused into each report's partial aggregation.
    */
  def syntheticFact(s: SparkSession, d: String): DataFrame = {
    val k = col("l_orderkey"); val p = col("l_partkey")
    val sk = col("l_suppkey"); val ln = col("l_linenumber")
    val age = when(k % 17 === 0, lit(null).cast("double"))
      .otherwise((k % 95).cast("double"))
    Tables.lineitem(s, d).select(
      k.as("report_primary_id"),
      concat(lit("DRUG_"), lpad((p % 200).cast("string"), 3, "0")).as("drug_name"),
      concat(lit("REACTION_"), lpad((sk % 40).cast("string"), 2, "0"))
        .as("reaction_preferred_term"),
      when(sk % 5 === 0, "Cardiac").when(sk % 5 === 1, "Neurological")
        .when(sk % 5 === 2, "Gastrointestinal").when(sk % 5 === 3, "Dermatological")
        .otherwise("Other").as("reaction_category"),
      ((k * 7 + ln * 3) % 10).cast("double").as("clinical_risk_score"),
      (p % 5 + 1).cast("double").as("reaction_severity_score"),
      (k % 13 === 0).as("is_life_threatening_reaction"),
      (k % 29 === 0).as("is_fatal_outcome"),
      age.as("patient_age"),
      when(age.isNull, "Unknown").when(age < 18, "Pediatric (0-17)")
        .when(age < 65, "Adult (18-64)").otherwise("Elderly (65+)")
        .as("patient_age_group"),
      coalesce(age < 18, lit(false)).as("is_pediatric_case"),
      coalesce(age >= 65, lit(false)).as("is_elderly_case"),
      (k % 2 === 0).as("is_female_patient"),
      (k % 3 === 0).as("is_healthcare_professional_report"),
      when(k % 3 === 0, "Expedited").when(k % 3 === 1, "Standard")
        .otherwise("Routine").as("regulatory_priority"),
      (k % 7).cast("double").as("reporter_reliability_score"),
      when(ln % 3 === 0, "High").when(ln % 3 === 1, "Medium")
        .otherwise("Low").as("data_quality_tier"),
      when((k + ln) % 3 === 0, "Complex").when((k + ln) % 3 === 1, "Moderate")
        .otherwise("Simple").as("case_complexity"),
      (p % 2 === 0).as("has_indication_data"),
      (p % 3 === 0).as("has_therapy_duration"),
      (p % 5 === 0).as("has_outcome_data"),
      when(k % 31 === 0, lit(null).cast("date"))
        .otherwise(col("l_shipdate").cast("date")).as("adverse_event_date"))
  }

  /** DuckDB twin of [[syntheticFact]]. */
  private val factCte: String =
    """WITH base AS (
      |  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_shipdate,
      |    CASE WHEN l_orderkey % 17 = 0 THEN NULL
      |         ELSE CAST(l_orderkey % 95 AS DOUBLE) END AS patient_age
      |  FROM lineitem),
      |fact AS (
      |  SELECT
      |    l_orderkey AS report_primary_id,
      |    'DRUG_' || lpad(CAST(l_partkey % 200 AS VARCHAR), 3, '0') AS drug_name,
      |    'REACTION_' || lpad(CAST(l_suppkey % 40 AS VARCHAR), 2, '0') AS reaction_preferred_term,
      |    CASE WHEN l_suppkey % 5 = 0 THEN 'Cardiac'
      |         WHEN l_suppkey % 5 = 1 THEN 'Neurological'
      |         WHEN l_suppkey % 5 = 2 THEN 'Gastrointestinal'
      |         WHEN l_suppkey % 5 = 3 THEN 'Dermatological'
      |         ELSE 'Other' END AS reaction_category,
      |    CAST((l_orderkey * 7 + l_linenumber * 3) % 10 AS DOUBLE) AS clinical_risk_score,
      |    CAST(l_partkey % 5 + 1 AS DOUBLE) AS reaction_severity_score,
      |    l_orderkey % 13 = 0 AS is_life_threatening_reaction,
      |    l_orderkey % 29 = 0 AS is_fatal_outcome,
      |    patient_age,
      |    CASE WHEN patient_age IS NULL THEN 'Unknown'
      |         WHEN patient_age < 18 THEN 'Pediatric (0-17)'
      |         WHEN patient_age < 65 THEN 'Adult (18-64)'
      |         ELSE 'Elderly (65+)' END AS patient_age_group,
      |    COALESCE(patient_age < 18, FALSE) AS is_pediatric_case,
      |    COALESCE(patient_age >= 65, FALSE) AS is_elderly_case,
      |    l_orderkey % 2 = 0 AS is_female_patient,
      |    l_orderkey % 3 = 0 AS is_healthcare_professional_report,
      |    CASE WHEN l_orderkey % 3 = 0 THEN 'Expedited'
      |         WHEN l_orderkey % 3 = 1 THEN 'Standard'
      |         ELSE 'Routine' END AS regulatory_priority,
      |    CAST(l_orderkey % 7 AS DOUBLE) AS reporter_reliability_score,
      |    CASE WHEN l_linenumber % 3 = 0 THEN 'High'
      |         WHEN l_linenumber % 3 = 1 THEN 'Medium'
      |         ELSE 'Low' END AS data_quality_tier,
      |    CASE WHEN (l_orderkey + l_linenumber) % 3 = 0 THEN 'Complex'
      |         WHEN (l_orderkey + l_linenumber) % 3 = 1 THEN 'Moderate'
      |         ELSE 'Simple' END AS case_complexity,
      |    l_partkey % 2 = 0 AS has_indication_data,
      |    l_partkey % 3 = 0 AS has_therapy_duration,
      |    l_partkey % 5 = 0 AS has_outcome_data,
      |    CASE WHEN l_orderkey % 31 = 0 THEN NULL
      |         ELSE CAST(l_shipdate AS DATE) END AS adverse_event_date
      |  FROM base)""".stripMargin

  private def oracle(body: String): String = factCte + "\n" + body.stripMargin

  // --- the 10 reports, each calling the real FactAnalytics function ---

  def topDrugs: Q = (s, d) => FactAnalytics.topDrugsByEvents(syntheticFact(s, d))

  val topDrugsSql: String = oracle(
    """SELECT drug_name, count(*) AS total_events,
      |  count(DISTINCT report_primary_id) AS unique_cases,
      |  avg(clinical_risk_score) AS avg_risk_score,
      |  CAST(sum(CASE WHEN is_life_threatening_reaction THEN 1 ELSE 0 END) AS BIGINT) AS life_threatening_count,
      |  CAST(sum(CASE WHEN is_fatal_outcome THEN 1 ELSE 0 END) AS BIGINT) AS fatal_count
      |FROM fact GROUP BY drug_name
      |ORDER BY total_events DESC, drug_name LIMIT 20""")

  def highRisk: Q = (s, d) => FactAnalytics.highRiskDrugs(syntheticFact(s, d))

  val highRiskSql: String = oracle(
    """SELECT drug_name, total_events, avg_risk_score, max_risk_score FROM (
      |  SELECT drug_name, count(*) AS total_events,
      |    avg(clinical_risk_score) AS avg_risk_score,
      |    max(clinical_risk_score) AS max_risk_score
      |  FROM fact GROUP BY drug_name) a
      |WHERE total_events >= 10
      |ORDER BY avg_risk_score DESC, drug_name LIMIT 15""")

  def reactionPatterns: Q = (s, d) => FactAnalytics.reactionPatterns(syntheticFact(s, d))

  val reactionPatternsSql: String = oracle(
    """SELECT reaction_preferred_term, reaction_category,
      |  count(*) AS total_occurrences,
      |  count(DISTINCT drug_name) AS drugs_associated,
      |  avg(reaction_severity_score) AS avg_severity,
      |  CAST(sum(CASE WHEN is_life_threatening_reaction THEN 1 ELSE 0 END) AS BIGINT) AS life_threatening_cases
      |FROM fact GROUP BY reaction_preferred_term, reaction_category
      |ORDER BY total_occurrences DESC, reaction_preferred_term, reaction_category LIMIT 25""")

  def ageDemographics: Q = (s, d) => FactAnalytics.ageDemographics(syntheticFact(s, d))

  val ageDemographicsSql: String = oracle(
    """SELECT patient_age_group, count(*) AS total_events,
      |  count(DISTINCT report_primary_id) AS unique_cases,
      |  avg(clinical_risk_score) AS avg_risk_score,
      |  avg(patient_age) AS avg_age,
      |  CAST(sum(CASE WHEN is_fatal_outcome THEN 1 ELSE 0 END) AS BIGINT) AS fatal_outcomes
      |FROM fact GROUP BY patient_age_group
      |ORDER BY total_events DESC, patient_age_group""")

  def genderAnalysis: Q = (s, d) => FactAnalytics.genderAnalysis(syntheticFact(s, d))

  val genderAnalysisSql: String = oracle(
    """SELECT is_female_patient, count(*) AS total_events,
      |  count(DISTINCT report_primary_id) AS unique_cases,
      |  avg(clinical_risk_score) AS avg_risk_score,
      |  CAST(sum(CASE WHEN is_life_threatening_reaction THEN 1 ELSE 0 END) AS BIGINT) AS life_threatening_count,
      |  CAST(sum(CASE WHEN is_fatal_outcome THEN 1 ELSE 0 END) AS BIGINT) AS fatal_count
      |FROM fact GROUP BY is_female_patient ORDER BY is_female_patient""")

  def reportingAnalysis: Q = (s, d) => FactAnalytics.reportingAnalysis(syntheticFact(s, d))

  val reportingAnalysisSql: String = oracle(
    """SELECT is_healthcare_professional_report, regulatory_priority,
      |  count(*) AS total_events,
      |  avg(reporter_reliability_score) AS avg_reliability,
      |  avg(clinical_risk_score) AS avg_risk_score
      |FROM fact GROUP BY is_healthcare_professional_report, regulatory_priority
      |ORDER BY total_events DESC, is_healthcare_professional_report, regulatory_priority""")

  def dataQuality: Q = (s, d) => FactAnalytics.dataQualityMetrics(syntheticFact(s, d))

  val dataQualitySql: String = oracle(
    s"""SELECT data_quality_tier, count(*) AS record_count,
      |  ${Num.roundAtSql(2, "count(*) * 100.0 / (SELECT count(*) FROM fact)")} AS percentage
      |FROM fact GROUP BY data_quality_tier
      |ORDER BY record_count DESC, data_quality_tier""")

  def complexity: Q = (s, d) => FactAnalytics.complexityAnalysis(syntheticFact(s, d))

  val complexitySql: String = oracle(
    """SELECT case_complexity, count(*) AS case_count,
      |  avg(clinical_risk_score) AS avg_risk_score,
      |  CAST(sum(CASE WHEN has_indication_data THEN 1 ELSE 0 END) AS BIGINT) AS has_indication,
      |  CAST(sum(CASE WHEN has_therapy_duration THEN 1 ELSE 0 END) AS BIGINT) AS has_duration,
      |  CAST(sum(CASE WHEN has_outcome_data THEN 1 ELSE 0 END) AS BIGINT) AS has_outcome
      |FROM fact GROUP BY case_complexity ORDER BY case_complexity""")

  def trend: Q = (s, d) => FactAnalytics.temporalTrends(syntheticFact(s, d))

  val trendSql: String = oracle(
    """SELECT CAST(year(adverse_event_date) AS INTEGER) AS event_year,
      |  count(*) AS total_events,
      |  count(DISTINCT report_primary_id) AS unique_cases,
      |  avg(clinical_risk_score) AS avg_risk_score,
      |  CAST(sum(CASE WHEN is_fatal_outcome THEN 1 ELSE 0 END) AS BIGINT) AS fatal_outcomes
      |FROM fact WHERE adverse_event_date IS NOT NULL
      |GROUP BY 1 ORDER BY event_year""")

  def summary: Q = (s, d) => FactAnalytics.summaryInsights(syntheticFact(s, d))

  val summarySql: String = oracle(
    """SELECT count(*) AS total_events,
      |  count(DISTINCT report_primary_id) AS total_cases,
      |  count(DISTINCT drug_name) AS total_drugs,
      |  avg(clinical_risk_score) AS avg_risk,
      |  CAST(sum(CASE WHEN is_life_threatening_reaction THEN 1 ELSE 0 END) AS BIGINT) AS life_threatening,
      |  CAST(sum(CASE WHEN is_fatal_outcome THEN 1 ELSE 0 END) AS BIGINT) AS fatal,
      |  CAST(sum(CASE WHEN is_pediatric_case THEN 1 ELSE 0 END) AS BIGINT) AS pediatric,
      |  CAST(sum(CASE WHEN is_elderly_case THEN 1 ELSE 0 END) AS BIGINT) AS elderly,
      |  CAST(sum(CASE WHEN is_healthcare_professional_report THEN 1 ELSE 0 END) AS BIGINT) AS hcp_reports
      |FROM fact""")

  val queries: Map[String, Q] = Map(
    "q_faers_top_drugs" -> topDrugs,
    "q_faers_high_risk" -> highRisk,
    "q_faers_reaction_patterns" -> reactionPatterns,
    "q_faers_age" -> ageDemographics,
    "q_faers_gender" -> genderAnalysis,
    "q_faers_reporting" -> reportingAnalysis,
    "q_faers_quality" -> dataQuality,
    "q_faers_complexity" -> complexity,
    "q_faers_trend" -> trend,
    "q_faers_summary" -> summary,
  )

  val oracles: Map[String, String] = Map(
    "q_faers_top_drugs" -> topDrugsSql,
    "q_faers_high_risk" -> highRiskSql,
    "q_faers_reaction_patterns" -> reactionPatternsSql,
    "q_faers_age" -> ageDemographicsSql,
    "q_faers_gender" -> genderAnalysisSql,
    "q_faers_reporting" -> reportingAnalysisSql,
    "q_faers_quality" -> dataQualitySql,
    "q_faers_complexity" -> complexitySql,
    "q_faers_trend" -> trendSql,
    "q_faers_summary" -> summarySql,
  )
}
