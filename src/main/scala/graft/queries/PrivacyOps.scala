package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** PII detection + redaction over a document corpus — the scrub step every
  * training-data pipeline runs before tokenization (emails, phone numbers,
  * SSNs, IP addresses → typed placeholder tokens).
  *
  * Pure projection: counts via `regexp_count` and redaction via chained
  * `regexp_replace`, all scan-side inside WholeStageCodegen — zero
  * shuffles except the presentation sort, so the op is scan-bound at
  * 100 TB exactly like the text-quality family. Patterns are RE2-safe
  * (no backreferences/lookaround) so the same regex runs on Spark (Java
  * regex) and DuckDB (RE2) with identical semantics.
  */
object PrivacyOps {

  type Q = (SparkSession, String) => DataFrame

  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe = """\b\d{3}[-.]\d{3}[-.]\d{4}\b"""
  val SsnRe = """\b\d{3}-\d{2}-\d{4}\b"""
  val IpRe = """\b(?:\d{1,3}\.){3}\d{1,3}\b"""

  /** Deterministic PII-planted corpus: documents text is digit-free (so
    * the base corpus contributes zero matches), with synthetic contact
    * lines appended on fixed id residues — the same construction in both
    * engines.
    */
  private def planted(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          lit(" Contact jane.doe@example.com or call 555-123-4567.")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit(" SSN: 123-45-6789 last login from 192.168.1.100.")).otherwise(lit("")))
        .as("text"))

  private val plantedSql: String =
    """planted AS (SELECT doc_id, text ||
      |    CASE WHEN doc_id % 7 = 0
      |         THEN ' Contact jane.doe@example.com or call 555-123-4567.' ELSE '' END ||
      |    CASE WHEN doc_id % 13 = 0
      |         THEN ' SSN: 123-45-6789 last login from 192.168.1.100.' ELSE '' END AS text
      |  FROM documents)""".stripMargin

  /** Per-document PII inventory + redacted text for every doc that
    * contains any PII. Counts run against the ORIGINAL text (audit
    * numbers); redaction replaces SSN before the more general phone
    * pattern so each span gets its most specific placeholder.
    */
  def piiScan: Q = (s, d) => {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "[EMAIL]"),
            SsnRe, "[SSN]"),
          PhoneRe, "[PHONE]"),
        IpRe, "[IP]")
    planted(s, d)
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count(col("text"), lit(PhoneRe)).cast("int").as("n_phones"),
        regexp_count(col("text"), lit(SsnRe)).cast("int").as("n_ssns"),
        regexp_count(col("text"), lit(IpRe)).cast("int").as("n_ips"),
        redacted.as("redacted"))
      .filter(col("n_emails") + col("n_phones") + col("n_ssns") + col("n_ips") > 0)
      .orderBy(col("doc_id"))
  }

  // DuckDB string literals are standard-conforming (backslash is literal);
  // only quotes need escaping
  private def reSql(re: String): String = re.replace("'", "''")

  val piiScanSql: String =
    s"""WITH $plantedSql
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '${reSql(EmailRe)}')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '${reSql(PhoneRe)}')) AS INTEGER) AS n_phones,
      |  CAST(len(regexp_extract_all(text, '${reSql(SsnRe)}')) AS INTEGER) AS n_ssns,
      |  CAST(len(regexp_extract_all(text, '${reSql(IpRe)}')) AS INTEGER) AS n_ips,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      |    '${reSql(EmailRe)}', '[EMAIL]', 'g'),
      |    '${reSql(SsnRe)}', '[SSN]', 'g'),
      |    '${reSql(PhoneRe)}', '[PHONE]', 'g'),
      |    '${reSql(IpRe)}', '[IP]', 'g') AS redacted
      |FROM planted
      |WHERE len(regexp_extract_all(text, '${reSql(EmailRe)}'))
      |    + len(regexp_extract_all(text, '${reSql(PhoneRe)}'))
      |    + len(regexp_extract_all(text, '${reSql(SsnRe)}'))
      |    + len(regexp_extract_all(text, '${reSql(IpRe)}')) > 0
      |ORDER BY doc_id""".stripMargin

  /** k-anonymity / l-diversity audit — the re-identification-risk check a
    * governance layer runs before releasing (or training on) user-linked
    * records. Quasi-identifier = (nation, account-balance band); sensitive
    * attribute = market segment. Every row lands in one equivalence class;
    * the report histograms class sizes (`k`) into policy buckets and
    * carries the worst-case l-diversity (`min_l`, distinct sensitive values
    * in the class) per bucket — `k=1` rows are fully re-identifiable,
    * `k<5` is what a k=5 suppression policy would drop, and `min_l=1`
    * means the sensitive value is disclosed even when k is large.
    *
    * Shape: ONE hash aggregate on the QI (map-side combine; the class
    * count is bounded by the QI domain, not the row count) + a tiny
    * re-aggregation over classes. The band edges compare integer cents, so
    * class membership is exact in both engines; `share_micro` is an
    * integer micro-share of rows per bucket (`div`, no float).
    */
  def kAnonymity: Q = (s, d) => {
    val cents = graft.queries.Num.cents(col("c_acctbal"))
    val band = when(cents < 0, "neg").when(cents < 250000L, "b0")
      .when(cents < 500000L, "b1").when(cents < 750000L, "b2")
      .otherwise("b3")
    val cls = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), band.as("band"))
      .agg(count(lit(1)).as("k"), countDistinct(col("c_mktsegment")).as("l"))
    val tot = cls.agg(sum(col("k")).as("tot"))
    cls.crossJoin(broadcast(tot))
      .withColumn("k_bucket",
        when(col("k") === 1, "k=1").when(col("k") < 5, "k=2-4")
          .when(col("k") < 10, "k=5-9").otherwise("k>=10"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"),
        min(col("l")).as("min_l"), max(col("tot")).as("tot"))
      .withColumn("share_micro", expr("(n_rows * 1000000) div tot"))
      .select(col("k_bucket"), col("n_classes"), col("n_rows"),
        col("min_l"), col("share_micro"))
      .orderBy(col("k_bucket"))
  }

  val kAnonymitySql: String =
    """WITH cls AS (SELECT c_nationkey,
      |    CASE WHEN round(c_acctbal*100) < 0 THEN 'neg'
      |         WHEN round(c_acctbal*100) < 250000 THEN 'b0'
      |         WHEN round(c_acctbal*100) < 500000 THEN 'b1'
      |         WHEN round(c_acctbal*100) < 750000 THEN 'b2'
      |         ELSE 'b3' END AS band,
      |    count(*) AS k, count(DISTINCT c_mktsegment) AS l
      |  FROM customer GROUP BY 1, 2),
      |t AS (SELECT CAST(sum(k) AS BIGINT) AS tot FROM cls)
      |SELECT CASE WHEN k = 1 THEN 'k=1' WHEN k < 5 THEN 'k=2-4'
      |         WHEN k < 10 THEN 'k=5-9' ELSE 'k>=10' END AS k_bucket,
      |  count(*) AS n_classes, CAST(sum(k) AS BIGINT) AS n_rows,
      |  CAST(min(l) AS BIGINT) AS min_l,
      |  CAST((sum(k) * 1000000) // any_value(tot) AS BIGINT) AS share_micro
      |FROM cls, t GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_pii_scan" -> piiScan,
    "q_k_anonymity" -> kAnonymity,
  )
  val oracles: Map[String, String] = Map(
    "q_pii_scan" -> piiScanSql,
    "q_k_anonymity" -> kAnonymitySql,
  )
}
