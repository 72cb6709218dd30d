package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Similarity, TextAnalysis => TA}

/** Window analytics (running totals, moving averages, ranking families) and
  * array higher-order functions over the embedding column.
  *
  * Window functions shuffle ONCE on the partition key and sort within
  * partitions — no matter how many window expressions share the same
  * `(partitionBy, orderBy)` spec, Catalyst evaluates them in a single Window
  * physical node, so "running sum + rank + ntile" costs the same shuffle as
  * any one of them. At 100 TB the partition key (custkey, nation) spreads
  * across executors; only a global-ORDER-BY-everything window (no
  * partitionBy) would serialize, and none of these do that except the final
  * presentation sort.
  *
  * Array HOFs (`transform/filter/aggregate`) run inside codegen on the
  * deserialized array — no explode-shuffle-reassemble round trip.
  */
object WindowArrayOps {

  type Q = (SparkSession, String) => DataFrame

  /** Running (cumulative) spend per customer in order-date order. Sums in
    * exact cents (see Num) so the carry is order-independent.
    */
  def windowRunning: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_cents", sum(Num.cents(col("o_totalprice"))).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        (col("running_cents").cast("double") / 100.0).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** 7-day-row moving average of daily revenue (frame `ROWS 6 PRECEDING`).
    * Daily pre-aggregation first — the window then runs over ~2.4k day rows,
    * not the raw fact table.
    */
  def windowMovingAvg: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(Num.cents(col("o_totalprice"))).as("day_cents"))
    val w = Window.orderBy(col("day").asc).rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("ma_cents", avg(col("day_cents")).over(w))
      .select(col("day").cast("string").as("day"),
        (col("day_cents").cast("double") / 100.0).as("day_revenue"),
        Num.roundAt(4)(col("ma_cents") / 100.0).as("ma7_revenue"))
      .orderBy(col("day"))
  }

  val windowMovingAvgSql: String =
    s"""WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS day_cents
      |  FROM orders GROUP BY 1)
      |SELECT CAST(day AS VARCHAR) AS day,
      |  CAST(day_cents AS DOUBLE) / 100.0 AS day_revenue,
      |  ${Num.roundAtSql(4, "avg(CAST(day_cents AS DOUBLE)) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0")} AS ma7_revenue
      |FROM daily ORDER BY day""".stripMargin

  /** Ranking family over one shared window spec: rank / dense_rank / ntile /
    * cume_dist of customers by total spend within their nation. The orderBy
    * carries a custkey tie-break so every rank flavor is deterministic.
    */
  def windowRank: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(Num.cents(col("o_totalprice"))).as("spend_cents"))
    val c = Tables.customer(s, d)
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("spend_cents").desc, col("c_custkey").asc)
    c.join(spend, c("c_custkey") === spend("o_custkey"), "inner")
      .select(col("c_nationkey"), col("c_custkey"), col("spend_cents"))
      .withColumn("rnk", rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cume", Num.roundAt(6)(cume_dist().over(w)))
      .filter(col("rnk") <= 5)
      .select(col("c_nationkey"), col("rnk").cast("long").as("rnk"),
        col("c_custkey"), (col("spend_cents").cast("double") / 100.0).as("spend"),
        col("quartile").cast("long").as("quartile"), col("cume"))
      .orderBy(col("c_nationkey"), col("rnk"))
  }

  val windowRankSql: String =
    s"""WITH spend AS (
      |  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_cents
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT c_nationkey, c_custkey, spend_cents,
      |    rank() OVER w AS rnk,
      |    ntile(4) OVER w AS quartile,
      |    ${Num.roundAtSql(6, "cume_dist() OVER w")} AS cume
      |  FROM customer JOIN spend ON c_custkey = o_custkey
      |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY spend_cents DESC, c_custkey ASC))
      |SELECT c_nationkey, CAST(rnk AS BIGINT) AS rnk, c_custkey,
      |  CAST(spend_cents AS DOUBLE) / 100.0 AS spend,
      |  CAST(quartile AS BIGINT) AS quartile, cume
      |FROM ranked WHERE rnk <= 5
      |ORDER BY c_nationkey, rnk""".stripMargin

  /** Array higher-order functions on the embedding column, no explode:
    * `aggregate` (l2 norm), `filter` (positive-component count), `array_max`.
    */
  def arrayHof: Q = (s, d) => {
    val v = Similarity.asDouble(col("embedding"))
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        round(sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x)), 4).as("l2_norm"),
        size(filter(v, _ > 0)).as("n_pos"),
        Num.roundAt(6)(array_max(v)).as("max_dim"))
      .orderBy(col("vec_id"))
  }

  val arrayHofSql: String =
    """SELECT vec_id,
      |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS l2_norm,
      |  CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INTEGER) AS n_pos,
      |  floor(list_max(embedding::DOUBLE[]) * 1000000 + 0.5) / 1000000 AS max_dim
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** posexplode → per-dimension stats for the first 8 embedding dimensions
    * by label (feature-drift monitoring shape). Sums in micros so partial
    * aggregation order cannot change the result.
    */
  def dimStats: Q = (s, d) => {
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(Similarity.asDouble(col("embedding"))))
      .filter(col("pos") < 8)
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(count(lit(1)).as("n"),
        Num.microSum(col("col")).as("sum_val"))
      .select(col("label"), col("dim").cast("int").as("dim"), col("n"),
        Num.roundAt(4)(col("sum_val")).as("sum_val"))
      .orderBy(col("label"), col("dim"))
  }

  val dimStatsSql: String =
    """SELECT label, CAST(k AS INTEGER) AS dim, count(*) AS n,
      |  floor(CAST(sum(CAST(round(embedding[k]::DOUBLE * 1000000) AS BIGINT)) AS DOUBLE)
      |    / 1000000.0 * 10000 + 0.5) / 10000 AS sum_val
      |FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS k)
      |GROUP BY label, k ORDER BY label, dim""".stripMargin

  /** explode(tokens) → corpus vocabulary histogram (generator + re-agg; the
    * companion to TextOps' per-document token counts).
    */
  def explodeTokens: Q = (s, d) => {
    Tables.documents(s, d)
      .select(explode(TA.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 100)
      .orderBy(col("n").desc, col("token").asc)
  }

  val explodeTokensSql: String =
    s"""SELECT token, count(*) AS n
      |FROM (SELECT unnest(${TA.tokensSql("text")}) AS token FROM documents)
      |GROUP BY token HAVING count(*) >= 100
      |ORDER BY n DESC, token ASC""".stripMargin

  /** Per-group top-k via the custom heap aggregate `graft_topk`
    * (functions.TopKAgg) — contrast with [[windowRank]]: the window form
    * shuffles and sorts every row; the aggregate ships at most k pairs per
    * group per mapper (map-side partial heaps). Same result, verified by
    * the same row_number oracle.
    */
  def topkPerGroup: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(call_function("graft_topk",
        col("o_totalprice"), col("o_orderkey"), lit(3)).as("top"))
      .select(col("o_orderpriority"),
        posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col("o_orderpriority"),
        (col("rnk0") + 1).cast("int").as("rnk"),
        col("t.payload").as("o_orderkey"),
        col("t.value").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  val topkPerGroupSql: String =
    """SELECT o_orderpriority, CAST(rnk AS INTEGER) AS rnk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin

  /** first_value / last_value / nth_value over an explicit full-partition
    * frame: each customer's order rows annotated with their first, latest,
    * and second order keys. (Default frames stop at CURRENT ROW —
    * last_value needs UNBOUNDED FOLLOWING spelled out, a classic trap.)
    */
  def windowFirstLast: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val windowFirstLastSql: String =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  last_value(o_orderkey) OVER w AS last_order,
      |  nth_value(o_orderkey, 2) OVER w AS second_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** VALUE-based window frame: per-customer trailing-7-day order count and
    * exact-cents spend, `RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND
    * CURRENT ROW` over the order date — the time-windowed running metric
    * ROWS frames can't express (the frame is defined by the ORDER BY
    * VALUE, so same-day peer rows always share a frame and gaps in the
    * date sequence shrink it). Trailing spend in integer cents (the
    * [[Num]] money policy) keeps the frame sums order-independent.
    *
    * SCALE: one shuffle on the customer key + one in-partition sort —
    * identical geometry to every other window in the family; the RANGE
    * bound is evaluated against the sorted run, no extra pass.
    */
  def windowRangeFrame: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_rf_v")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_orderdate AS DATE) AS STRING) AS order_date,
        |  n_7d, CAST(cents_7d AS DOUBLE) / 100.0 AS sum_7d
        |FROM (SELECT o_orderkey, o_custkey, o_orderdate,
        |    count(*) OVER w AS n_7d,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS cents_7d
        |  FROM (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |      o_totalprice FROM orders_rf_v)
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW))
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)
  }

  val windowRangeFrameSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
      |  n_7d, CAST(cents_7d AS DOUBLE) / 100.0 AS sum_7d
      |FROM (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |    count(*) OVER w AS n_7d,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS cents_7d
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
      |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW))
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_window_range_frame" -> windowRangeFrame,
    "q_window_firstlast" -> windowFirstLast,
    "q_topk_per_group" -> topkPerGroup,
    "q_window_running" -> windowRunning,
    "q_window_moving_avg" -> windowMovingAvg,
    "q_window_rank" -> windowRank,
    "q_array_hof" -> arrayHof,
    "q_dim_stats" -> dimStats,
    "q_explode_tokens" -> explodeTokens,
  )

  val oracles: Map[String, String] = Map(
    "q_window_range_frame" -> windowRangeFrameSql,
    "q_window_firstlast" -> windowFirstLastSql,
    "q_topk_per_group" -> topkPerGroupSql,
    "q_window_running" -> windowRunningSql,
    "q_window_moving_avg" -> windowMovingAvgSql,
    "q_window_rank" -> windowRankSql,
    "q_array_hof" -> arrayHofSql,
    "q_dim_stats" -> dimStatsSql,
    "q_explode_tokens" -> explodeTokensSql,
  )
}
