package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Hashing, Sketches}

/** Sketch-aggregate queries: deterministic approximate distinct counting
  * via the KMV k-min-set aggregate ([[graft.functions.KmvAgg]]). The md5
  * hash makes the sketch reproducible in DuckDB, so even the APPROXIMATE
  * answer is hash-gated — the estimate column must match the oracle's
  * bit-for-bit, alongside the exact count it approximates.
  */
object SketchOps {

  type Q = (SparkSession, String) => DataFrame

  private val K = 256

  /** Distinct customers per order priority: exact count vs the KMV
    * estimate from a 256-hash sketch. At sf ≥ 0.01 every group overflows
    * the sketch (estimation path); the oracle reproduces the estimator
    * via row_number over the same md5 hashes.
    */
  def kmvDistinct: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_exact"),
        Sketches.kmv(Hashing.md5Long(col("o_custkey")), K).as("kmv"))
      .select(col("o_orderpriority"), col("n_exact"),
        Sketches.kmvEstimate(col("kmv"), K).as("n_approx"))
      .orderBy(col("o_orderpriority"))

  val kmvDistinctSql: String = {
    val h = Hashing.md5LongSql("o_custkey")
    s"""WITH hs AS (SELECT DISTINCT o_orderpriority, $h AS h FROM orders),
      |rk AS (SELECT o_orderpriority, h,
      |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS nd
      |  FROM hs),
      |kth AS (SELECT o_orderpriority, max(nd) AS nd,
      |    max(CASE WHEN rn = $K THEN h END) AS hk
      |  FROM rk GROUP BY o_orderpriority),
      |ex AS (SELECT o_orderpriority,
      |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT e.o_orderpriority, e.n_exact,
      |  ${Sketches.kmvEstimateSql("k.nd", "k.hk", K)} AS n_approx
      |FROM ex e JOIN kth k USING (o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin
  }

  // --------------------------------------------------- count-min frequency

  private val CmsDepth = 3
  private val CmsWidth = 512
  private val ProbeTokens = Seq("join", "hash", "row", "batch", "scan")

  /** Token-frequency estimation over the whole corpus vocabulary with a
    * fixed 3×512-counter count-min sketch: one pass builds the sketch (6 KB
    * of state for an unbounded vocabulary), probes read min-over-rows.
    * Exact counts ride along; the oracle reproduces the entire counter
    * matrix from the same md5 cell arithmetic, so even the collision error
    * is bit-identical.
    */
  def cmsCounts: Q = (s, d) => {
    import graft.ops.{Dedup, TextAnalysis => TA}
    // both the sketch build and the probe aggregation consume the token
    // stream — materialize it once instead of re-tokenizing the corpus
    // (same shared-input pattern as Dedup.ngramJaccardPairs)
    val toks = Tables.documents(s, d)
      .select(explode(TA.tokens(col("text"))).as("tok"))
      .localCheckpoint()
    val mask = (c: org.apache.spark.sql.Column) =>
      Hashing.md5Long(c).bitwiseAND(lit(Dedup.HashMask))
    val sk = toks.agg(Sketches.cms(mask(col("tok")), CmsDepth, CmsWidth).as("sk"))
    toks.filter(col("tok").isin(ProbeTokens: _*))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(sk))
      .withColumn("n_cms",
        Sketches.cmsEstimate(col("sk"), mask(col("tok")), CmsDepth, CmsWidth))
      .select(col("tok"), col("n_exact"), col("n_cms"))
      .orderBy(col("tok"))
  }

  val cmsCountsSql: String = {
    import graft.ops.{Dedup, TextAnalysis => TA}
    val h = s"${Hashing.md5LongSql("tok")} & ${Dedup.HashMask}"
    val cellRows = (0 until CmsDepth).map(dd =>
      s"SELECT $dd AS d, ${Sketches.cmsCellSql("h", dd, CmsWidth)} AS cell, " +
        "count(*) AS c FROM h GROUP BY 2").mkString("\n  UNION ALL ")
    val probeList = ProbeTokens.map(t => s"'$t'").mkString(", ")
    val mins = (0 until CmsDepth).map(dd =>
      s"(SELECT c FROM cells WHERE d = $dd AND cell = " +
        s"${Sketches.cmsCellSql("p.h", dd, CmsWidth)})").mkString(", ")
    s"""WITH toks AS (SELECT unnest(${TA.tokensSql("text")}) AS tok FROM documents),
      |h AS (SELECT tok, $h AS h FROM toks),
      |cells AS (
      |  $cellRows),
      |probes AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_exact, max(h) AS h
      |  FROM h WHERE tok IN ($probeList) GROUP BY tok)
      |SELECT p.tok, p.n_exact, least($mins) AS n_cms
      |FROM probes p ORDER BY p.tok""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_kmv_distinct" -> kmvDistinct,
    "q_cms_counts" -> cmsCounts,
  )

  val oracles: Map[String, String] = Map(
    "q_kmv_distinct" -> kmvDistinctSql,
    "q_cms_counts" -> cmsCountsSql,
  )
}
