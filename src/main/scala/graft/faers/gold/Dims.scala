package graft.faers.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The seven SCD Type 2 dimensions of the FAERS star schema
  * (reference: src/gold/dims/dim_&#42;.py). Each builder is a pure
  * silver-DataFrame → dimension-DataFrame function: select/rename the
  * business keys + attributes, `.distinct()`, then derive profile flags.
  * The SCD2 maintenance itself is core.Scd2 (merge keys below are verbatim
  * from each dim's `business_keys`/`tracked_columns`).
  */
object Dims {

  final case class DimSpec(
      name: String,
      sourceTable: String,
      businessKeys: Seq[String],
      trackedCols: Seq[String],
      build: DataFrame => DataFrame)

  private def flag(c: Column): Column = when(c, true).otherwise(false)

  /** dim_patient.py:20-111. */
  def patient(demographics: DataFrame): DataFrame =
    demographics.select(
        col("primary_id").as("patient_primary_id"),
        col("caseid").as("patient_case_id"),
        col("age").as("patient_age"),
        col("age_group").as("patient_age_group"),
        col("age_category").as("patient_age_category"),
        col("sex").as("patient_sex"),
        col("wt").as("patient_weight"),
        col("weight_category").as("patient_weight_category"),
        col("reporter_country"),
        col("occr_country").as("occurrence_country"),
        col("event_dt").as("event_date"),
        col("init_fda_dt").as("initial_fda_date"),
        col("mfr_dt").as("manufacturer_date"),
        col("fda_dt").as("fda_date"),
        col("rept_dt").as("report_date"),
        col("silver_processed_ts").as("source_processed_ts"),
        current_timestamp().as("dim_created_ts"))
      .distinct()
      .withColumn("patient_age_numeric",
        when(col("patient_age_category") === "Years", col("patient_age"))
          .when(col("patient_age_category") === "Months", col("patient_age") / 12.0)
          .when(col("patient_age_category") === "Weeks", col("patient_age") / 52.0)
          .when(col("patient_age_category") === "Days", col("patient_age") / 365.0)
          .otherwise(lit(null)))
      .withColumn("is_pediatric", flag(col("patient_age_numeric") < 18))
      .withColumn("is_elderly", flag(col("patient_age_numeric") >= 65))
      .withColumn("has_weight_data", flag(col("patient_weight").isNotNull))
      .withColumn("reporter_region",
        when(col("reporter_country").isin("US", "CA", "MX"), "North America")
          .when(col("reporter_country").isin(
            "GB", "DE", "FR", "IT", "ES", "NL", "SE", "NO", "DK", "FI"), "Europe")
          .when(col("reporter_country").isin("JP", "CN", "IN", "KR", "AU"), "Asia Pacific")
          .when(col("reporter_country").isin("BR", "AR", "CL", "CO"), "South America")
          .otherwise("Other"))

  /** dim_drug.py:20-160. */
  def drug(drugDetails: DataFrame): DataFrame =
    drugDetails.select(
        col("primary_id").as("drug_report_id"),
        col("drug_seq").as("drug_sequence_number"),
        col("drugname").as("drug_name"),
        col("prod_ai").as("active_ingredient"),
        col("val_vbm").as("drug_verbatim"),
        col("role_cod").as("drug_role_code"),
        col("role_description").as("drug_role_description"),
        col("dose_vbm").as("dose_verbatim"),
        col("dose_amt").as("dose_amount"),
        col("dose_unit"),
        col("dose_form"),
        col("route").as("administration_route"),
        col("dose_freq").as("dose_frequency"),
        col("nda_num").as("nda_number"),
        col("exp_dt").as("expiration_date"),
        col("silver_processed_ts").as("source_processed_ts"),
        current_timestamp().as("dim_created_ts"))
      .distinct()
      .withColumn("drug_name_clean",
        upper(trim(regexp_replace(col("drug_name"), "[^\\w\\s]", ""))))
      .withColumn("dose_amount_derived",
        when(col("dose_amount").isNull,
          when(regexp_extract(col("dose_verbatim"), "(\\d+\\.?\\d*)", 1) =!= "",
            regexp_extract(col("dose_verbatim"), "(\\d+\\.?\\d*)", 1).cast("double"))
            .otherwise(lit(null)))
          .otherwise(col("dose_amount")))
      .withColumn("dose_unit_derived",
        when(col("dose_unit").isNull,
          when(regexp_extract(col("dose_verbatim"), "\\d+\\.?\\d*\\s*(\\w+)", 1) =!= "",
            upper(trim(regexp_extract(col("dose_verbatim"), "\\d+\\.?\\d*\\s*(\\w+)", 1))))
            .otherwise(lit(null)))
          .otherwise(col("dose_unit")))
      .withColumn("is_primary_suspect", flag(col("drug_role_code") === "PS"))
      .withColumn("is_suspect_drug", flag(col("drug_role_code").isin("PS", "SS")))
      .withColumn("is_concomitant", flag(col("drug_role_code") === "C"))
      .withColumn("route_standardized",
        when(upper(col("administration_route")).contains("ORAL"), "Oral")
          .when(upper(col("administration_route")).contains("IV"), "Intravenous")
          .when(upper(col("administration_route")).contains("IM"), "Intramuscular")
          .when(upper(col("administration_route")).contains("TOPICAL"), "Topical")
          .when(upper(col("administration_route")).contains("SUBCUTANEOUS"), "Subcutaneous")
          .otherwise("Other"))

  /** dim_reaction.py:35-55 select + profile flags. */
  def reaction(reactions: DataFrame): DataFrame =
    reactions.select(
        col("primary_id").as("reaction_report_id"),
        col("pt").as("preferred_term"),
        col("pt").as("reaction_preferred_term"),
        col("reaction_category"),
        col("severity_classification"),
        col("system_organ_class"),
        col("drug_rec_act").as("drug_action_code"),
        col("drug_rec_act_description").as("drug_action_description"),
        col("reaction_priority_score"),
        col("silver_processed_ts").as("source_processed_ts"),
        current_timestamp().as("dim_created_ts"))
      .distinct()
      .withColumn("is_fatal", flag(col("reaction_category") === "Fatal"))
      .withColumn("is_life_threatening",
        flag(col("severity_classification") === "Life-threatening"))
      .withColumn("is_serious",
        flag(col("severity_classification").isin("Life-threatening", "Serious")))
      .withColumn("has_drug_action", flag(col("drug_action_code").isNotNull))

  /** dim_outcome.py:35-49 select + profile flags. */
  def outcome(outcomes: DataFrame): DataFrame =
    outcomes.select(
        col("primary_id").as("outcome_report_id"),
        col("outc_cod").as("outcome_code"),
        col("outcome_description"),
        col("outcome_severity_rank"),
        col("outcome_category"),
        col("silver_processed_ts").as("source_processed_ts"),
        current_timestamp().as("dim_created_ts"))
      .distinct()
      .withColumn("is_fatal", flag(col("outcome_code") === "DE"))
      .withColumn("is_life_threatening", flag(col("outcome_code") === "LT"))
      .withColumn("is_serious", flag(col("outcome_severity_rank") >= 4))
      .withColumn("requires_hospitalization", flag(col("outcome_code") === "HO"))

  /** dim_indication.py:35-49 select + profile flags. */
  def indication(indications: DataFrame): DataFrame =
    indications.select(
        col("primary_id").as("indication_report_id"),
        col("indi_pt").as("indication_preferred_term"),
        col("indi_pt").as("medical_indication"),
        col("therapeutic_area"),
        col("indication_severity"),
        col("silver_processed_ts").as("source_processed_ts"),
        current_timestamp().as("dim_created_ts"))
      .distinct()
      .withColumn("is_oncology", flag(col("therapeutic_area") === "Oncology"))
      .withColumn("is_chronic_condition", flag(col("indication_severity") === "Moderate"))
      .withColumn("is_severe", flag(col("indication_severity") === "Severe"))

  /** dim_therapy.py:35-56 select + profile flags. */
  def therapy(therapyDates: DataFrame): DataFrame =
    therapyDates.select(
        col("primary_id").as("therapy_report_id"),
        col("dsg_drug_seq").as("drug_sequence_key"),
        col("start_dt").as("therapy_start_date"),
        col("end_dt").as("therapy_end_date"),
        col("therapy_duration_days"),
        col("reported_duration_days"),
        col("therapy_status"),
        col("duration_category"),
        col("dur").as("duration_value"),
        col("dur_cod").as("duration_code"),
        col("duration_description").as("duration_unit_description"),
        col("silver_processed_ts").as("source_processed_ts"),
        current_timestamp().as("dim_created_ts"))
      .distinct()
      .withColumn("is_completed", flag(col("therapy_status") === "Completed"))
      .withColumn("is_ongoing", flag(col("therapy_status") === "Ongoing"))
      .withColumn("is_long_term", flag(col("therapy_duration_days") > 90))
      .withColumn("has_duration_data", flag(col("therapy_duration_days").isNotNull))

  /** dim_report.py:35-51 select + profile flags. */
  def report(reports: DataFrame): DataFrame =
    reports.select(
        col("primary_id").as("report_primary_id"),
        col("caseid").as("report_case_id"),
        col("rpsr_cod").as("reporter_source_code"),
        col("reporter_source_description"),
        col("reporter_category"),
        col("reporter_reliability_score"),
        col("regulatory_priority"),
        col("silver_processed_ts").as("source_processed_ts"),
        current_timestamp().as("dim_created_ts"))
      .distinct()
      .withColumn("is_healthcare_professional",
        flag(col("reporter_source_code") === "HP"))
      .withColumn("is_high_reliability", flag(col("reporter_reliability_score") >= 4))
      .withColumn("requires_followup", flag(col("regulatory_priority") === "High"))
      .withColumn("report_quality_score",
        col("reporter_reliability_score") * lit(2))

  /** Merge configuration verbatim from each reference dim's
    * `business_keys` / `tracked_columns`.
    */
  val specs: Seq[DimSpec] = Seq(
    DimSpec("dim_patient", "demographics",
      Seq("patient_primary_id", "patient_case_id"),
      Seq("patient_age", "patient_age_group", "patient_age_category",
        "patient_sex", "patient_weight", "patient_weight_category",
        "reporter_country", "occurrence_country", "patient_age_numeric",
        "is_pediatric", "is_elderly", "has_weight_data", "reporter_region"),
      patient),
    DimSpec("dim_drug", "drug_details",
      Seq("drug_report_id", "drug_sequence_number"),
      Seq("drug_name", "active_ingredient", "drug_role_code", "dose_amount",
        "dose_unit", "administration_route", "drug_name_clean",
        "dose_amount_derived", "dose_unit_derived", "is_primary_suspect",
        "is_suspect_drug", "is_concomitant", "route_standardized"),
      drug),
    DimSpec("dim_reaction", "reactions",
      Seq("reaction_report_id", "preferred_term"),
      Seq("reaction_category", "severity_classification", "system_organ_class",
        "drug_action_code", "reaction_priority_score", "is_fatal",
        "is_life_threatening", "is_serious"),
      reaction),
    DimSpec("dim_outcome", "outcomes",
      Seq("outcome_report_id", "outcome_code"),
      Seq("outcome_description", "outcome_severity_rank", "outcome_category",
        "is_fatal", "is_life_threatening", "is_serious",
        "requires_hospitalization"),
      outcome),
    DimSpec("dim_indication", "indications",
      Seq("indication_report_id", "indication_preferred_term"),
      Seq("therapeutic_area", "indication_severity", "is_oncology",
        "is_chronic_condition", "is_severe"),
      indication),
    DimSpec("dim_therapy", "therapy_dates",
      Seq("therapy_report_id", "drug_sequence_key"),
      Seq("therapy_start_date", "therapy_end_date", "therapy_duration_days",
        "reported_duration_days", "therapy_status", "duration_category",
        "is_completed", "is_ongoing", "is_long_term"),
      therapy),
    DimSpec("dim_report", "reports",
      Seq("report_primary_id", "report_case_id"),
      Seq("reporter_source_code", "reporter_source_description",
        "reporter_category", "reporter_reliability_score",
        "regulatory_priority", "is_healthcare_professional",
        "is_high_reliability", "requires_followup"),
      report))
}
