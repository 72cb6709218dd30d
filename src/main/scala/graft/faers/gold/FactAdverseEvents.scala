package graft.faers.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

/** The star schema's single fact table at drug×reaction grain — "one row
  * per drug-reaction combination per adverse event report"
  * (reference: src/gold/facts/fact_adverse_events.py:20-312).
  *
  * Join plan (J1-J7, SURVEY.md §2.3): reactions ⋈ drug_details ⋈
  * demographics (inner — deliberate grain explosion), left joins to
  * indications / therapy / outcomes / reports, then three role-playing
  * dim_date joins.
  *
  * Divergence, documented: the reference joins dim_date via
  * `to_date(col("event_dt"), "yyyyMMdd") == date_value`
  * (fact_adverse_events.py:160) even though silver already standardized
  * `event_dt` to DATE — re-parsing a DATE with a numeric format nulls every
  * key. We implement the *implied* semantics (join the DATE column
  * directly), which is also what the reference's own column comments
  * describe.
  *
  * Scale: the six case-keyed joins all share the (primary_id, caseid)
  * shuffle key, so Catalyst reuses one exchange across J1-J6; dim_date is
  * ~11k rows → broadcast hash joins for J7. Output partitioned by
  * (fact_created_date, reporter_country) per the reference sink.
  */
object FactAdverseEvents {

  def create(demographics: DataFrame, drugDetails: DataFrame,
             reactions: DataFrame, indications: DataFrame,
             therapyDates: DataFrame, outcomes: DataFrame,
             reports: DataFrame, dimDate: DataFrame): DataFrame = {

    val factBase = reactions.select(
      col("primary_id"), col("caseid"),
      col("pt").as("reaction_preferred_term"),
      col("drug_rec_act").as("drug_action_code"),
      col("reaction_category"), col("severity_classification"),
      col("reaction_priority_score"))

    val withDrugs = factBase.join(
      drugDetails.select("primary_id", "caseid", "drug_seq", "drugname",
        "role_cod", "dose_amt", "route"),
      Seq("primary_id", "caseid"), "inner")

    val withPatient = withDrugs.join(
      demographics.select("primary_id", "caseid", "age", "sex", "wt",
        "age_group", "reporter_country", "event_dt", "rept_dt", "fda_dt",
        "init_fda_dt"),
      Seq("primary_id", "caseid"), "inner")

    val withIndication = withPatient.join(
      indications.select("primary_id", "caseid", "indi_drug_seq", "indi_pt")
        .withColumnRenamed("indi_drug_seq", "drug_seq"),
      Seq("primary_id", "caseid", "drug_seq"), "left")

    val withTherapy = withIndication.join(
      therapyDates.select("primary_id", "caseid", "dsg_drug_seq", "start_dt",
        "end_dt", "dur", "dur_cod")
        .withColumnRenamed("dsg_drug_seq", "drug_seq"),
      Seq("primary_id", "caseid", "drug_seq"), "left")

    val withOutcome = withTherapy.join(
      outcomes.select("primary_id", "caseid", "outc_cod",
        "outcome_description", "outcome_severity_rank", "outcome_category"),
      Seq("primary_id", "caseid"), "left")

    val complete = withOutcome.join(
      reports.select("primary_id", "caseid", "rpsr_cod",
        "reporter_source_description", "reporter_reliability_score",
        "regulatory_priority"),
      Seq("primary_id", "caseid"), "left")

    // Role-playing date dimension ×3 (small → broadcast hash joins).
    val dd = broadcast(dimDate)
    val withEventDate = complete.join(
      dd.select(col("date_key").as("event_date_key"),
        col("date_value").as("event_date"),
        col("year").as("event_year"), col("quarter").as("event_quarter"),
        col("month").as("event_month"),
        col("year_quarter").as("event_year_quarter"),
        col("reporting_period").as("event_reporting_period")),
      col("event_dt") === col("event_date"), "left")

    val withReportDate = withEventDate.join(
      dd.select(col("date_key").as("report_date_key"),
        col("date_value").as("report_date"),
        col("year").as("report_year"), col("quarter").as("report_quarter"),
        col("month").as("report_month"),
        col("year_quarter").as("report_year_quarter"),
        col("reporting_period").as("report_reporting_period")),
      col("rept_dt") === col("report_date"), "left")

    val withFdaDate = withReportDate.join(
      dd.select(col("date_key").as("fda_received_date_key"),
        col("date_value").as("fda_received_date"),
        col("year").as("fda_received_year"),
        col("quarter").as("fda_received_quarter"),
        col("year_quarter").as("fda_received_year_quarter")),
      col("fda_dt") === col("fda_received_date"), "left")

    withFdaDate.select(
        col("event_date_key"),
        col("report_date_key"),
        col("fda_received_date_key"),
        col("primary_id").as("report_primary_id"),
        col("caseid").as("report_case_id"),
        col("drug_seq").as("drug_sequence_number"),
        col("reaction_preferred_term"),
        coalesce(col("indi_pt"), lit("Unknown")).as("indication_preferred_term"),
        coalesce(col("outc_cod"), lit("Unknown")).as("outcome_code"),
        col("reaction_priority_score").cast(DecimalType(5, 2))
          .as("reaction_severity_score"),
        coalesce(col("outcome_severity_rank"), lit(0)).cast(IntegerType)
          .as("outcome_severity_rank"),
        coalesce(col("reporter_reliability_score"), lit(1)).cast(IntegerType)
          .as("reporter_reliability_score"),
        col("age").cast(IntegerType).as("patient_age"),
        col("wt").cast(DecimalType(8, 2)).as("patient_weight"),
        col("dose_amt").cast(DecimalType(15, 4)).as("drug_dose_amount"),
        // Preserved reference quirk (fact_adverse_events.py:216-222): the
        // fact tests dur_cod == "DAY" although the FAERS code — used by the
        // reference's own silver layer — is "DY". "DY" rows therefore fall
        // through `.otherwise(dur)` (accidentally right) and "HR"/"MIN"
        // rows surface raw counts as days. Replicated, not fixed — the
        // CORRECT conversion exists upstream as silver
        // therapy_dates.reported_duration_days (silver_therapy_dates.py:67-90).
        when(col("dur_cod") === "DAY", col("dur"))
          .when(col("dur_cod") === "WK", col("dur") * 7)
          .when(col("dur_cod") === "MON", col("dur") * 30)
          .when(col("dur_cod") === "YR", col("dur") * 365)
          .otherwise(col("dur"))
          .cast(IntegerType).as("therapy_duration_days"),
        (col("role_cod") === "PS").as("is_primary_suspect_drug"),
        (col("severity_classification") === "Life-threatening")
          .as("is_life_threatening_reaction"),
        (col("outcome_category") === "Fatal").as("is_fatal_outcome"),
        (col("sex") === "F").as("is_female_patient"),
        (col("age") < 18).as("is_pediatric_case"),
        (col("age") >= 65).as("is_elderly_case"),
        (col("reporter_source_description") === "Healthcare Professional")
          .as("is_healthcare_professional_report"),
        col("drug_action_code").isNotNull.as("has_drug_action_taken"),
        col("indi_pt").isNotNull.as("has_indication_data"),
        col("dur").isNotNull.as("has_therapy_duration"),
        col("outc_cod").isNotNull.as("has_outcome_data"),
        col("event_date_key").isNotNull.as("has_event_date"),
        col("report_date_key").isNotNull.as("has_report_date"),
        col("fda_received_date_key").isNotNull.as("has_fda_received_date"),
        col("reaction_category"),
        col("outcome_category"),
        col("age_group").as("patient_age_group"),
        col("reporter_country"),
        col("regulatory_priority"),
        col("route").as("administration_route"),
        col("drugname").as("drug_name"),
        col("event_dt").as("adverse_event_date"),
        col("start_dt").as("therapy_start_date"),
        col("end_dt").as("therapy_end_date"),
        col("event_year").as("event_occurrence_year"),
        col("event_quarter").as("event_occurrence_quarter"),
        col("event_year_quarter").as("event_occurrence_year_quarter"),
        col("event_reporting_period"),
        col("report_year").as("report_submission_year"),
        col("report_quarter").as("report_submission_quarter"),
        col("fda_received_year").as("fda_processing_year"),
        datediff(col("report_date"), col("event_date")).as("days_event_to_report"),
        datediff(col("fda_received_date"), col("report_date")).as("days_report_to_fda"),
        datediff(col("fda_received_date"), col("event_date")).as("days_event_to_fda_receipt"),
        when(col("event_dt").isNull || col("reaction_preferred_term").isNull ||
          col("drugname").isNull, "Poor")
          .when(col("indi_pt").isNull || col("dur").isNull ||
            col("outc_cod").isNull, "Moderate")
          .otherwise("Good").as("data_quality_tier"),
        current_timestamp().as("fact_created_ts"),
        current_date().as("fact_created_date"))
      .withColumn("clinical_risk_score",
        (col("reaction_severity_score") * 0.4) +
          (col("outcome_severity_rank") * 0.3) +
          (when(col("is_life_threatening_reaction"), 3).otherwise(0) * 0.2) +
          (when(col("is_fatal_outcome"), 5).otherwise(0) * 0.1))
      .withColumn("case_complexity",
        when(col("has_indication_data") && col("has_therapy_duration") &&
          col("has_outcome_data") && col("is_healthcare_professional_report"), "High")
          .when(col("has_indication_data") && col("has_outcome_data"), "Medium")
          .otherwise("Low"))
  }
}
