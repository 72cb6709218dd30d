package graft.faers.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's analytics/report layer (src/gold/analytics/
  * fact_analytics.py:20-256), returning DataFrames instead of just logging
  * so every report is assertable/oracle-checkable.
  *
  * All are single groupBy-agg shuffles with top-k sinks
  * (`TakeOrderedAndProject`); partial aggregation keeps the shuffle
  * proportional to group cardinality, not fact rows.
  *
  * Every top-k sort carries the group key as a tie-breaker: the reference
  * leaves tie order unspecified (nondeterministic under Spark), which makes
  * the SELECTED SET at the limit boundary change run to run — unacceptable
  * for a hash-gated report and for regression-diffing 100 TB runs.
  */
object FactAnalytics {

  /** fact_analytics.py:46-59. */
  def topDrugsByEvents(fact: DataFrame, limit: Int = 20): DataFrame =
    fact.groupBy("drug_name")
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("report_primary_id")).as("unique_cases"),
        avg(col("clinical_risk_score")).as("avg_risk_score"),
        sum(col("is_life_threatening_reaction").cast("int")).as("life_threatening_count"),
        sum(col("is_fatal_outcome").cast("int")).as("fatal_count"))
      .orderBy(desc("total_events"), col("drug_name"))
      .limit(limit)

  /** fact_analytics.py:65-75. */
  def highRiskDrugs(fact: DataFrame, minEvents: Int = 10, limit: Int = 15): DataFrame =
    fact.groupBy("drug_name")
      .agg(
        count(lit(1)).as("total_events"),
        avg(col("clinical_risk_score")).as("avg_risk_score"),
        max(col("clinical_risk_score")).as("max_risk_score"))
      .filter(col("total_events") >= minEvents)
      .orderBy(desc("avg_risk_score"), col("drug_name"))
      .limit(limit)

  /** fact_analytics.py:84-96. */
  def reactionPatterns(fact: DataFrame, limit: Int = 25): DataFrame =
    fact.groupBy("reaction_preferred_term", "reaction_category")
      .agg(
        count(lit(1)).as("total_occurrences"),
        countDistinct(col("drug_name")).as("drugs_associated"),
        avg(col("reaction_severity_score")).as("avg_severity"),
        sum(col("is_life_threatening_reaction").cast("int")).as("life_threatening_cases"))
      .orderBy(desc("total_occurrences"), col("reaction_preferred_term"), col("reaction_category"))
      .limit(limit)

  /** fact_analytics.py:105-115. */
  def ageDemographics(fact: DataFrame): DataFrame =
    fact.groupBy("patient_age_group")
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("report_primary_id")).as("unique_cases"),
        avg(col("clinical_risk_score")).as("avg_risk_score"),
        avg(col("patient_age")).as("avg_age"),
        sum(col("is_fatal_outcome").cast("int")).as("fatal_outcomes"))
      .orderBy(desc("total_events"), col("patient_age_group"))

  /** fact_analytics.py:121-129. */
  def genderAnalysis(fact: DataFrame): DataFrame =
    fact.groupBy("is_female_patient")
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("report_primary_id")).as("unique_cases"),
        avg(col("clinical_risk_score")).as("avg_risk_score"),
        sum(col("is_life_threatening_reaction").cast("int")).as("life_threatening_count"),
        sum(col("is_fatal_outcome").cast("int")).as("fatal_count"))
      .orderBy(col("is_female_patient"))

  /** fact_analytics.py:137-145. */
  def reportingAnalysis(fact: DataFrame): DataFrame =
    fact.groupBy("is_healthcare_professional_report", "regulatory_priority")
      .agg(
        count(lit(1)).as("total_events"),
        avg(col("reporter_reliability_score")).as("avg_reliability"),
        avg(col("clinical_risk_score")).as("avg_risk_score"))
      .orderBy(desc("total_events"), col("is_healthcare_professional_report"),
        col("regulatory_priority"))

  /** fact_analytics.py:153-159 — percentage-of-total with a pre-computed
    * driver scalar (the reference's two-query pattern). Rounding is the
    * repo-wide arithmetic half-up ([[graft.queries.Num.roundAt]]) rather
    * than builtin `round`: percentages are rational-valued and land on
    * exact .5 boundaries, where engine builtins disagree.
    */
  def dataQualityMetrics(fact: DataFrame): DataFrame = {
    val totalEvents = fact.count()
    fact.groupBy("data_quality_tier")
      .agg(
        count(lit(1)).as("record_count"),
        graft.queries.Num.roundAt(2)(count(lit(1)) * 100.0 / totalEvents).as("percentage"))
      .orderBy(desc("record_count"), col("data_quality_tier"))
  }

  /** fact_analytics.py:166-172. */
  def complexityAnalysis(fact: DataFrame): DataFrame =
    fact.groupBy("case_complexity")
      .agg(
        count(lit(1)).as("case_count"),
        avg(col("clinical_risk_score")).as("avg_risk_score"),
        sum(col("has_indication_data").cast("int")).as("has_indication"),
        sum(col("has_therapy_duration").cast("int")).as("has_duration"),
        sum(col("has_outcome_data").cast("int")).as("has_outcome"))
      .orderBy(col("case_complexity"))

  /** fact_analytics.py:180-190. */
  def temporalTrends(fact: DataFrame): DataFrame =
    fact.filter(col("adverse_event_date").isNotNull)
      .groupBy(year(col("adverse_event_date")).as("event_year"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("report_primary_id")).as("unique_cases"),
        avg(col("clinical_risk_score")).as("avg_risk_score"),
        sum(col("is_fatal_outcome").cast("int")).as("fatal_outcomes"))
      .orderBy("event_year")

  /** fact_analytics.py:208-222 — the 9-aggregate global summary row. */
  def summaryInsights(fact: DataFrame): DataFrame =
    fact.select(
      count(lit(1)).as("total_events"),
      countDistinct(col("report_primary_id")).as("total_cases"),
      countDistinct(col("drug_name")).as("total_drugs"),
      avg(col("clinical_risk_score")).as("avg_risk"),
      sum(col("is_life_threatening_reaction").cast("int")).as("life_threatening"),
      sum(col("is_fatal_outcome").cast("int")).as("fatal"),
      sum(col("is_pediatric_case").cast("int")).as("pediatric"),
      sum(col("is_elderly_case").cast("int")).as("elderly"),
      sum(col("is_healthcare_professional_report").cast("int")).as("hcp_reports"))

  /** All 10 reports keyed by the reference's section names — the
    * `generate_adverse_events_analytics` driver surface
    * (fact_analytics.py:19-255) minus the `show()` side effects: callers
    * (pipeline runner, tests, notebooks) decide how to materialize.
    */
  def all(fact: DataFrame): Seq[(String, DataFrame)] = Seq(
    "top_drugs" -> topDrugsByEvents(fact),
    "high_risk_drugs" -> highRiskDrugs(fact),
    "reaction_patterns" -> reactionPatterns(fact),
    "age_demographics" -> ageDemographics(fact),
    "gender_analysis" -> genderAnalysis(fact),
    "reporting_analysis" -> reportingAnalysis(fact),
    "data_quality" -> dataQualityMetrics(fact),
    "complexity" -> complexityAnalysis(fact),
    "temporal_trends" -> temporalTrends(fact),
    "summary_insights" -> summaryInsights(fact))
}
