package graft.faers

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** FAERS bronze landing schemas — all-string, fixed/explicit, never inferred
  * (reference: src/bronze/ingest_demographics.py:23-51 and the six sibling
  * ingest scripts; column lists verbatim).
  */
object Schemas {

  private def st(cols: String*): StructType =
    StructType(cols.map(StructField(_, StringType, nullable = true)))

  val demographics: StructType = st(
    "primaryid", "caseid", "caseversion", "i_f_code", "event_dt", "mfr_dt",
    "init_fda_dt", "fda_dt", "rept_cod", "auth_num", "mfr_num", "mfr_sndr",
    "lit_ref", "age", "age_cod", "age_grp", "sex", "e_sub", "wt", "wt_cod",
    "rept_dt", "to_mfr", "occp_cod", "reporter_country", "occr_country")

  val drugDetails: StructType = st(
    "primaryid", "caseid", "drug_seq", "role_cod", "drugname", "prod_ai",
    "val_vbm", "route", "dose_vbm", "cum_dose_chr", "cum_dose_unit", "dechal",
    "rechal", "lot_num", "exp_dt", "nda_num", "dose_amt", "dose_unit",
    "dose_form", "dose_freq")

  val reactions: StructType = st("primaryid", "caseid", "pt", "drug_rec_act")

  val outcomes: StructType = st("primaryid", "caseid", "outc_cod")

  val indications: StructType = st("primaryid", "caseid", "indi_drug_seq", "indi_pt")

  val reports: StructType = st("primaryid", "caseid", "rpsr_cod")

  val therapyDates: StructType = st(
    "primaryid", "caseid", "dsg_drug_seq", "start_dt", "end_dt", "dur", "dur_cod")

  /** table name -> (landing file prefix, schema); file layout
    * `year=YYYY/quarter=N/<PREFIX>YYQN.txt` (ingest_demographics.py:15).
    */
  val tables: Map[String, (String, StructType)] = Map(
    "demographics" -> ("DEMO", demographics),
    "drug_details" -> ("DRUG", drugDetails),
    "reactions" -> ("REAC", reactions),
    "outcomes" -> ("OUTC", outcomes),
    "indications" -> ("INDI", indications),
    "reports" -> ("RPSR", reports),
    "therapy_dates" -> ("THER", therapyDates))
}
