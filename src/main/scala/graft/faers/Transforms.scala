package graft.faers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Silver-layer standardization library — same semantics as the reference's
  * transform utilities (reference: src/utils/silver_transformations.py,
  * src/utils/jobs.py), re-expressed as pure `DataFrame => DataFrame`
  * functions over codegen'd built-in expressions (no UDFs).
  *
  * Determinism note: the wall-clock metadata columns take an optional fixed
  * clock so golden tests are reproducible (SURVEY.md §7.5 hard part #2).
  */
object Transforms {

  /** FAERS date repair by length dispatch: 8-digit yyyyMMdd, 6-digit
    * yyyyMM + "01", 4-digit yyyy + "0101", anything else -> null
    * (reference: silver_transformations.py:48-71). `try_to_date` keeps the
    * null-on-garbage contract regardless of spark.sql.ansi.enabled.
    */
  def repairFaersDateCol(c: Column): Column =
    when(length(c) === 8, try_to_date(c, "yyyyMMdd"))
      .when(length(c) === 6, try_to_date(concat(c, lit("01")), "yyyyMMdd"))
      .when(length(c) === 4, try_to_date(concat(c, lit("0101")), "yyyyMMdd"))
      .otherwise(lit(null).cast("date"))

  def repairFaersDate(df: DataFrame, src: String, dst: String): DataFrame =
    df.withColumn(dst, repairFaersDateCol(col(src)))

  /** In-place repair of every listed date column that exists in the frame. */
  def standardizeDateFields(df: DataFrame, dateColumns: Seq[String]): DataFrame =
    dateColumns.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, repairFaersDateCol(col(c)))
    }

  /** String->double coercion gated on `^[0-9]+\.?[0-9]*$` — negatives and
    * exponents intentionally rejected, exactly like the reference
    * (silver_transformations.py:76-90).
    *
    * The gate is byte arithmetic, not a regex matcher: a string matches
    * iff (a) stripping the ASCII digits leaves "" or a single "." and
    * (b) the first character is a digit — provably the same language as
    * the anchored regex over end-of-line-free input (TransformsSpec
    * exhausts the shape space). The ONE divergence is deliberate: Java's
    * un-flagged `$` also matches before a trailing line terminator
    * ("12\n" passed rlike), while RE2 — the engine the DuckDB oracle
    * runs — anchors at end-of-text; this form matches the oracle
    * exactly. This runs over 7 columns x every silver row — the same
    * interpreted-regex-in-the-hot-path class the round-11 contains-
    * rewrite removed from the screens.
    */
  def standardizeNumericFields(df: DataFrame, numericColumns: Seq[String]): DataFrame =
    numericColumns.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(numericShape(col(c)), col(c).cast(DoubleType))
          .otherwise(lit(null).cast(DoubleType)))
    }

  /** `^[0-9]+\.?[0-9]*$` as codegen'd byte ops (see
    * [[standardizeNumericFields]]): only digits and at most one dot, and
    * the first char is a digit (which also rejects "" and ".5").
    */
  private[faers] def numericShape(c: Column): Column =
    translate(c, "0123456789", "").isin("", ".") &&
      substring(c, 1, 1).between("0", "9")

  /** Age bucketing; null -> "Unknown"; drops the raw FAERS `age_grp` column
    * (silver_transformations.py:93-107).
    */
  def calculateAgeGroups(df: DataFrame, ageColumn: String = "age"): DataFrame =
    if (!df.columns.contains(ageColumn)) df
    else df.withColumn("age_group",
        when(col(ageColumn) < 18, "Pediatric (0-17)")
          .when(col(ageColumn) >= 18 && col(ageColumn) < 65, "Adult (18-64)")
          .when(col(ageColumn) >= 65, "Elderly (65+)")
          .otherwise("Unknown"))
      .drop("age_grp")

  /** Silver audit columns (silver_transformations.py:110-116). */
  def addSilverMetadata(df: DataFrame,
                        fixedClock: Option[java.time.Instant] = None): DataFrame =
    fixedClock match {
      case Some(i) =>
        val ts = java.sql.Timestamp.from(i)
        df.withColumn("silver_processed_ts", lit(ts))
          .withColumn("silver_processing_date", lit(ts).cast("date"))
      case None =>
        df.withColumn("silver_processed_ts", current_timestamp())
          .withColumn("silver_processing_date", current_date())
    }

  /** Drug-name cleanup: strip non-word/non-space chars, trim, upper-case
    * (silver_transformations.py:119-131).
    */
  def standardizeDrugNames(df: DataFrame, drugnameColumn: String = "drugname"): DataFrame =
    if (!df.columns.contains(drugnameColumn)) df
    else df.withColumn(drugnameColumn,
      upper(trim(regexp_replace(col(drugnameColumn), "[^\\w\\s]", ""))))

  /** Dose parse from verbatim text into (dose, dose_unit, dose_frequency)
    * via the reference's three regex extracts
    * (silver_transformations.py:134-163).
    */
  def parseDosageInformation(df: DataFrame): DataFrame =
    if (!df.columns.contains("dose_vbm")) df
    else df
      .withColumn("dose",
        when(regexp_extract(col("dose_vbm"), "(\\d+\\.?\\d*)", 1) =!= "",
          regexp_extract(col("dose_vbm"), "(\\d+\\.?\\d*)", 1).cast(DoubleType))
          .otherwise(lit(null).cast(DoubleType)))
      .withColumn("dose_unit",
        when(regexp_extract(col("dose_vbm"), "\\d+\\.?\\d*\\s*(\\w+)", 1) =!= "",
          upper(trim(regexp_extract(col("dose_vbm"), "\\d+\\.?\\d*\\s*(\\w+)", 1))))
          .otherwise(lit("")))
      .withColumn("dose_frequency",
        when(regexp_extract(col("dose_vbm"), ",(.*)", 1) =!= "",
          upper(trim(regexp_extract(col("dose_vbm"), ",(.*)", 1))))
          .otherwise(lit("")))

  /** Bronze audit columns (jobs.py:15-20). */
  def addIngestionMetadata(df: DataFrame,
                           fixedClock: Option[java.time.Instant] = None): DataFrame = {
    val ts = fixedClock
      .map(i => lit(java.sql.Timestamp.from(i)))
      .getOrElse(current_timestamp())
    df.withColumn("_ingest_ts", ts).withColumn("_source_file", input_file_name())
  }

  /** Latest-partition incremental read: eager MAX(_ingest_ts) scalar, then an
    * equality filter on the partition column — two separate queries on
    * purpose, pinning one partition even if data lands mid-run
    * (silver_transformations.py:21-45). The filter hits the partition column,
    * so `PruneFileSourcePartitions` turns it into a metadata-only prune: at
    * 100 TB only the newest partition's files are listed and scanned.
    */
  def readLatestPartition(spark: SparkSession, tableName: String,
                          schema: String = "bronze"): DataFrame = {
    val fq = s"$schema.$tableName"
    val latest = spark.table(fq).agg(max(col("_ingest_ts"))).collect()(0).get(0)
    spark.table(fq).filter(col("_ingest_ts") === lit(latest))
  }
}
