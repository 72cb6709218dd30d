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

  val queries: Map[String, Q] = Map(
    "q_kmv_distinct" -> kmvDistinct,
  )

  val oracles: Map[String, String] = Map(
    "q_kmv_distinct" -> kmvDistinctSql,
  )
}
