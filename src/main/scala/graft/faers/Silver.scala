package graft.faers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver-layer table transforms — pure `DataFrame => DataFrame`, one per
  * FAERS table, column-for-column the reference's silver scripts
  * (src/silver/silver_*.py). Callers feed the latest bronze partition
  * (Transforms.readLatestPartition) and overwrite `silver.<table>`.
  *
  * Everything here is when-chains / regex / date arithmetic on built-in
  * expressions: one codegen'd Project per table, no shuffles.
  */
object Silver {

  /** code -> label chain with an `otherwise` default. */
  private def mapCode(c: Column, default: String)(pairs: (String, String)*): Column =
    pairs.foldLeft(Option.empty[Column]) { case (acc, (code, label)) =>
      Some(acc.fold(when(c === code, label))(_.when(c === code, label)))
    }.get.otherwise(default)

  /** `c` contains any of the literal substrings — the reference expresses
    * these screens as `rlike(".*LIT.*|.*LIT.*")`, which is an UNANCHORED
    * regex of pure literals, i.e. exactly substring containment. Java
    * regex evaluates the alternation per row (~µs each × 17 screens ×
    * every reaction row — the dominant silver-stage cost at any scale);
    * `contains` compiles to UTF8String.contains inside the scan's
    * whole-stage codegen (~10-30× cheaper), and `||` keeps rlike's exact
    * null semantics (null input → null → when-branch false).
    */
  private def containsAny(c: Column, subs: String*): Column =
    subs.map(c.contains(_: String)).reduce(_ || _)

  private val renameIds = Map("primaryid" -> "primary_id")

  /** silver_demographics.py:26-80. */
  def demographics(bronze: DataFrame,
                   fixedClock: Option[java.time.Instant] = None): DataFrame = {
    val dated = Transforms.standardizeDateFields(bronze,
      Seq("event_dt", "init_fda_dt", "mfr_dt", "fda_dt", "rept_dt"))
    val nums = Transforms.standardizeNumericFields(dated, Seq("age", "wt"))
    val aged = Transforms.calculateAgeGroups(nums, "age")
    val out = aged
      .withColumn("age_category",
        mapCode(col("age_cod"), "Unknown")(
          "YR" -> "Years", "MON" -> "Months", "WK" -> "Weeks",
          "DY" -> "Days", "HR" -> "Hours"))
      .drop("age_cod")
      .withColumn("weight_category",
        mapCode(col("wt_cod"), "Unknown")("KG" -> "Kilograms", "LB" -> "Pounds"))
      .drop("wt_cod")
      .withColumnsRenamed(renameIds)
    Transforms.addSilverMetadata(out, fixedClock)
  }

  /** silver_drug_details.py:25-67. */
  def drugDetails(bronze: DataFrame,
                  fixedClock: Option[java.time.Instant] = None): DataFrame = {
    val dated = Transforms.standardizeDateFields(bronze, Seq("exp_dt"))
    val nums = Transforms.standardizeNumericFields(dated,
      Seq("drug_seq", "val_vbm", "dose_amt", "nda_num"))
    val out = nums
      .withColumn("role_description",
        mapCode(col("role_cod"), "Unknown")(
          "PS" -> "Primary Suspect", "SS" -> "Secondary Suspect",
          "C" -> "Concomitant", "I" -> "Interacting"))
      .withColumnsRenamed(renameIds)
    Transforms.addSilverMetadata(out, fixedClock)
  }

  /** silver_reactions.py:23-167 — PT regex categorization, severity,
    * system-organ-class, drug-action decode, priority score.
    */
  def reactions(bronze: DataFrame,
                fixedClock: Option[java.time.Instant] = None): DataFrame = {
    val pt = upper(col("pt"))
    val categorized = bronze
      .withColumn("reaction_category",
        when(pt.contains("DEATH"), "Fatal")
          .when(containsAny(pt, "CANCER", "MALIGNANT", "NEOPLASM", "CARCINOMA", "TUMOR"), "Neoplastic")
          .when(containsAny(pt, "CARDIAC", "HEART", "MYOCARDIAL", "ARRHYTHMIA"), "Cardiovascular")
          .when(containsAny(pt, "HEPAT", "LIVER", "JAUNDICE"), "Hepatic")
          .when(containsAny(pt, "RENAL", "KIDNEY", "NEPHRO"), "Renal")
          .when(containsAny(pt, "NEURO", "BRAIN", "SEIZURE", "CONVULSION"), "Neurological")
          .when(containsAny(pt, "RASH", "DERMAT", "SKIN", "ERYTHEMA"), "Dermatological")
          .when(containsAny(pt, "GASTROINT", "NAUSEA", "VOMIT", "DIARR"), "Gastrointestinal")
          .when(containsAny(pt, "RESPIR", "LUNG", "PNEUM", "DYSPNEA"), "Respiratory")
          .when(containsAny(pt, "INFECTION", "SEPSIS", "PNEUMONIA"), "Infectious")
          .when(containsAny(pt, "PSYCHIATRIC", "DEPRESSION", "ANXIETY", "PSYCHOSIS"), "Psychiatric")
          .when(containsAny(pt, "METASTASES", "METASTATIC", "PROGRESSION"), "Disease Progression")
          .otherwise("Other"))
      .withColumn("severity_classification",
        when(containsAny(pt, "DEATH", "FATAL", "DIED"), "Life-threatening")
          .when(containsAny(pt, "SERIOUS", "SEVERE", "ACUTE", "EMERGENCY"), "Serious")
          .when(containsAny(pt, "HOSPITALI", "ADMIT", "ICU"), "Hospitalization Required")
          .when(containsAny(pt, "MILD", "MINOR", "SLIGHT"), "Mild")
          .when(containsAny(pt, "MODERATE", "MEDIUM"), "Moderate")
          .otherwise("Unspecified"))
      .withColumn("system_organ_class",
        mapCode(col("reaction_category"),
          "General disorders and administration site conditions")(
          "Cardiovascular" -> "Cardiac disorders",
          "Hepatic" -> "Hepatobiliary disorders",
          "Renal" -> "Renal and urinary disorders",
          "Neurological" -> "Nervous system disorders",
          "Dermatological" -> "Skin and subcutaneous tissue disorders",
          "Gastrointestinal" -> "Gastrointestinal disorders",
          "Respiratory" -> "Respiratory, thoracic and mediastinal disorders",
          "Infectious" -> "Infections and infestations",
          "Psychiatric" -> "Psychiatric disorders",
          "Neoplastic" -> "Neoplasms benign, malignant and unspecified"))
      .withColumn("drug_rec_act_description",
        mapCode(col("drug_rec_act"), "No action specified")(
          "1" -> "Drug withdrawn", "2" -> "Dose reduced", "3" -> "Dose increased",
          "4" -> "Dose not changed", "5" -> "Unknown", "6" -> "Not applicable"))
      .withColumn("reaction_priority_score",
        when(col("severity_classification") === "Life-threatening", 10)
          .when(col("severity_classification") === "Serious", 8)
          .when(col("severity_classification") === "Hospitalization Required", 7)
          .when(col("severity_classification") === "Moderate", 5)
          .when(col("severity_classification") === "Mild", 3)
          .otherwise(1))
      .withColumnsRenamed(renameIds)
    Transforms.addSilverMetadata(categorized, fixedClock)
  }

  /** silver_outcomes.py:23-81. */
  def outcomes(bronze: DataFrame,
               fixedClock: Option[java.time.Instant] = None): DataFrame = {
    val out = bronze
      .withColumn("outcome_description",
        mapCode(col("outc_cod"), "Unknown")(
          "DE" -> "Death", "LT" -> "Life-threatening",
          "HO" -> "Hospitalization - initial or prolonged",
          "DS" -> "Disability", "CA" -> "Congenital anomaly",
          "RI" -> "Required intervention to prevent permanent impairment/damage",
          "OT" -> "Other serious (important medical events)"))
      .withColumn("outcome_severity_rank",
        when(col("outc_cod") === "DE", 7).when(col("outc_cod") === "LT", 6)
          .when(col("outc_cod") === "CA", 5).when(col("outc_cod") === "DS", 4)
          .when(col("outc_cod") === "HO", 3).when(col("outc_cod") === "RI", 2)
          .when(col("outc_cod") === "OT", 1).otherwise(0))
      .withColumn("outcome_category",
        when(col("outc_cod") === "DE", "Fatal")
          .when(col("outc_cod").isin("LT", "CA", "DS"), "Serious Non-Fatal")
          .when(col("outc_cod").isin("HO", "RI"), "Medically Significant")
          .when(col("outc_cod") === "OT", "Other Serious")
          .otherwise("Unknown"))
      .withColumnsRenamed(renameIds)
    Transforms.addSilverMetadata(out, fixedClock)
  }

  /** silver_indications.py:23-126 — therapeutic-area + severity regexes. */
  def indications(bronze: DataFrame,
                  fixedClock: Option[java.time.Instant] = None): DataFrame = {
    val ip = upper(col("indi_pt"))
    val out = bronze
      .withColumn("therapeutic_area",
        when(containsAny(ip, "CANCER", "MALIGNANT", "NEOPLASM", "CARCINOMA", "TUMOR", "METASTATIC"), "Oncology")
          .when(containsAny(ip, "DIABETES", "DIABETIC"), "Endocrinology")
          .when(containsAny(ip, "CARDIAC", "HEART", "HYPERTENSION", "CARDIOVASCULAR"), "Cardiology")
          .when(containsAny(ip, "DEPRESSION", "ANXIETY", "PSYCHIATRIC", "BIPOLAR", "SCHIZOPHRENIA"), "Psychiatry")
          .when(containsAny(ip, "INFECTION", "BACTERIAL", "VIRAL", "FUNGAL", "ANTIBIOTIC"), "Infectious Diseases")
          .when(containsAny(ip, "PAIN", "ARTHRITIS", "RHEUMAT", "INFLAMMATION"), "Rheumatology")
          .when(containsAny(ip, "ASTHMA", "COPD", "RESPIRATORY", "LUNG"), "Pulmonology")
          .when(containsAny(ip, "ALZHEIMER", "DEMENTIA", "PARKINSON", "EPILEPSY", "SEIZURE"), "Neurology")
          .when(containsAny(ip, "GASTRO", "ULCER", "CROHN", "COLITIS"), "Gastroenterology")
          .otherwise("Other"))
      .withColumn("indication_severity",
        when(containsAny(ip, "METASTATIC", "STAGE IV", "TERMINAL", "ADVANCED"), "Severe")
          .when(containsAny(ip, "ACUTE", "SEVERE", "CRISIS", "EMERGENCY"), "Severe")
          .when(containsAny(ip, "CHRONIC", "MODERATE", "PERSISTENT"), "Moderate")
          .when(containsAny(ip, "MILD", "MINOR", "EARLY"), "Mild")
          .otherwise("Unspecified"))
      .withColumnsRenamed(renameIds)
    Transforms.addSilverMetadata(out, fixedClock)
  }

  /** silver_reports.py:23-82. */
  def reports(bronze: DataFrame,
              fixedClock: Option[java.time.Instant] = None): DataFrame = {
    val out = bronze
      .withColumn("reporter_source_description",
        mapCode(col("rpsr_cod"), "Unspecified")(
          "HP" -> "Healthcare Professional", "CSM" -> "Consumer/Patient",
          "LW" -> "Lawyer", "OTH" -> "Other", "UNK" -> "Unknown"))
      .withColumn("reporter_category",
        when(col("rpsr_cod") === "HP", "Professional")
          .when(col("rpsr_cod") === "CSM", "Consumer")
          .when(col("rpsr_cod").isin("LW", "OTH"), "Other Professional")
          .otherwise("Unknown"))
      .withColumn("reporter_reliability_score",
        when(col("rpsr_cod") === "HP", 5).when(col("rpsr_cod") === "LW", 4)
          .when(col("rpsr_cod") === "CSM", 3).when(col("rpsr_cod") === "OTH", 2)
          .otherwise(1))
      .withColumn("regulatory_priority",
        when(col("rpsr_cod") === "HP", "High")
          .when(col("rpsr_cod") === "LW", "Medium")
          .otherwise("Standard"))
      .withColumnsRenamed(renameIds)
    Transforms.addSilverMetadata(out, fixedClock)
  }

  /** silver_therapy_dates.py:25-133 — duration decode, datediff, unit
    * conversions (×365/×30/×7/÷24), status + duration categories.
    */
  def therapyDates(bronze: DataFrame,
                   fixedClock: Option[java.time.Instant] = None): DataFrame = {
    val dated = Transforms.standardizeDateFields(bronze, Seq("start_dt", "end_dt"))
    val nums = Transforms.standardizeNumericFields(dated, Seq("dsg_drug_seq", "dur"))
    val out = nums
      .withColumn("duration_description",
        mapCode(col("dur_cod"), "Unknown")(
          "YR" -> "Years", "MON" -> "Months", "WK" -> "Weeks",
          "DY" -> "Days", "HR" -> "Hours", "MIN" -> "Minutes"))
      .withColumn("therapy_duration_days",
        when(col("start_dt").isNotNull && col("end_dt").isNotNull,
          datediff(col("end_dt"), col("start_dt"))).otherwise(lit(null)))
      .withColumn("reported_duration_days",
        when(col("dur").isNotNull && col("dur_cod") === "YR", col("dur") * 365)
          .when(col("dur").isNotNull && col("dur_cod") === "MON", col("dur") * 30)
          .when(col("dur").isNotNull && col("dur_cod") === "WK", col("dur") * 7)
          .when(col("dur").isNotNull && col("dur_cod") === "DY", col("dur"))
          .when(col("dur").isNotNull && col("dur_cod") === "HR", col("dur") / 24)
          .otherwise(lit(null)))
      .withColumn("therapy_status",
        when(col("start_dt").isNotNull && col("end_dt").isNotNull, "Completed")
          .when(col("start_dt").isNotNull && col("end_dt").isNull, "Ongoing")
          .when(col("start_dt").isNull, "Unknown Start")
          .otherwise("Unknown"))
      .withColumn("duration_category",
        when(col("therapy_duration_days") <= 7, "Short-term (≤1 week)")
          .when(col("therapy_duration_days") > 7 && col("therapy_duration_days") <= 30,
            "Medium-term (1-4 weeks)")
          .when(col("therapy_duration_days") > 30 && col("therapy_duration_days") <= 90,
            "Long-term (1-3 months)")
          .when(col("therapy_duration_days") > 90, "Extended (>3 months)")
          .otherwise("Unknown Duration"))
      .withColumnsRenamed(renameIds)
    Transforms.addSilverMetadata(out, fixedClock)
  }

  /** All transforms keyed by table, for the pipeline runner. */
  val all: Map[String, (DataFrame, Option[java.time.Instant]) => DataFrame] = Map(
    "demographics" -> (demographics(_, _)),
    "drug_details" -> (drugDetails(_, _)),
    "reactions" -> (reactions(_, _)),
    "outcomes" -> (outcomes(_, _)),
    "indications" -> (indications(_, _)),
    "reports" -> (reports(_, _)),
    "therapy_dates" -> (therapyDates(_, _)))
}
