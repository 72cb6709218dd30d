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
      .transform(graft.core.Checkpoint.apply)
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

  // ------------------------------------------- histogram-based quantiles

  private val QBuckets = 256

  /** Approximate per-group price quantiles (p50/p95/p99) from a fixed
    * 256-bucket equi-width histogram — the third sketch family after
    * frequency (CMS) and distinct (KMV): bucket counts ADD, so unlike
    * exact percentiles (which need a full sort of history) the state
    * merges across batches/partitions and fits incremental rollups.
    * Error is bounded by one bucket width of the global [min,max] range.
    *
    * Determinism discipline: values are integer cents, bucket index and
    * quantile targets are integer `div` arithmetic, the estimate is the
    * bucket's upper edge in integer cents — so Spark and DuckDB agree
    * bit-for-bit, and even the approximation error is hash-gated.
    * Shuffle shape: ONE partial-aggregated groupBy(group, bucket) over
    * the fact table (≤ groups×256 rows out), then tiny window/agg work.
    */
  def approxQuantiles: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cents = Num.cents(col("l_extendedprice"))
    // consumed twice (range scan, bucket counts) — materialize once
    val li = Tables.lineitem(s, d).select(col("l_returnflag"), cents.as("c"))
      .transform(graft.core.Checkpoint.apply)
    val r = li.agg(min(col("c")), max(col("c"))).first()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val span = hi - lo + 1
    val counts = li
      .withColumn("b", least(lit(QBuckets - 1),
        expr(s"((c - ${lo}L) * $QBuckets) div ${span}L")))
      .groupBy(col("l_returnflag"), col("b"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(
        Window.partitionBy(col("l_returnflag"))))
    // min bucket whose cumulative count reaches ceil(pct% of total)
    def qEst(pct: Int) =
      min(when(col("cum") >= expr(s"(total * $pct + 99) div 100"), col("b")))
    // bucket upper edge in dollars — integer `div` end to end: double
    // casts round in DuckDB but truncate in Spark, so no double may carry
    // a fractional part across the engines
    def edge(bCol: String) =
      expr(s"cast(${lo}L + (($bCol + 1) * ${span}L) div ${QBuckets}L as double)") / 100.0
    cum.groupBy(col("l_returnflag"))
      .agg(qEst(50).as("b50"), qEst(95).as("b95"), qEst(99).as("b99"))
      .select(col("l_returnflag"),
        edge("b50").as("p50"), edge("b95").as("p95"), edge("b99").as("p99"))
      .orderBy(col("l_returnflag"))
  }

  val approxQuantilesSql: String = {
    val cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    s"""WITH v AS (SELECT l_returnflag, $cents AS c FROM lineitem),
      |r AS (SELECT min(c) AS lo, max(c) - min(c) + 1 AS span FROM v),
      |counts AS (SELECT l_returnflag,
      |    least($QBuckets - 1, ((c - r.lo) * $QBuckets) // r.span) AS b,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM v CROSS JOIN r GROUP BY 1, 2),
      |cum AS (SELECT l_returnflag, b, n,
      |    sum(n) OVER (PARTITION BY l_returnflag ORDER BY b
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(n) OVER (PARTITION BY l_returnflag) AS total
      |  FROM counts),
      |picks AS (SELECT l_returnflag,
      |    min(CASE WHEN cum >= (total * 50 + 99) // 100 THEN b END) AS b50,
      |    min(CASE WHEN cum >= (total * 95 + 99) // 100 THEN b END) AS b95,
      |    min(CASE WHEN cum >= (total * 99 + 99) // 100 THEN b END) AS b99
      |  FROM cum GROUP BY 1)
      |SELECT l_returnflag,
      |  CAST(r.lo + ((b50 + 1) * r.span) // $QBuckets AS DOUBLE) / 100.0 AS p50,
      |  CAST(r.lo + ((b95 + 1) * r.span) // $QBuckets AS DOUBLE) / 100.0 AS p95,
      |  CAST(r.lo + ((b99 + 1) * r.span) // $QBuckets AS DOUBLE) / 100.0 AS p99
      |FROM picks CROSS JOIN r ORDER BY l_returnflag""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_kmv_distinct" -> kmvDistinct,
    "q_cms_counts" -> cmsCounts,
    "q_approx_quantiles" -> approxQuantiles,
  )

  val oracles: Map[String, String] = Map(
    "q_kmv_distinct" -> kmvDistinctSql,
    "q_cms_counts" -> cmsCountsSql,
    "q_approx_quantiles" -> approxQuantilesSql,
  )
}
