package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Core relational operator coverage (SURVEY.md §2.2-§2.6) re-expressed on
  * the driver's analytical tables.
  *
  * Every query here is deterministic: total ordering with tie-breakers and
  * aggregates rounded AFTER aggregation so the DuckDB oracle hash-matches.
  * Shapes mirror the reference pipeline's patterns:
  *  - multi-agg groupBy (reference: src/gold/analytics/fact_analytics.py:46-59)
  *  - when/otherwise conditional counts (fact_analytics.py:52-55)
  *  - orderBy+limit top-k (fact_analytics.py:57-58)
  *  - inner/left multi-table equi-join chains (fact_adverse_events.py:58-190)
  *  - md5 surrogate keys (utils/scd_type2.py:54-61)
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** A4/A2: groupBy multi-aggregate over the fact table (TPC-H Q1 shape). */
  def aggLineitem: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_quantity") < 50)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Num.moneySum(col("l_extendedprice")).as("sum_base_price"),
        Num.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val aggLineitemSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
      |  ${Num.moneySumSql("l_extendedprice")} AS sum_base_price,
      |  ${Num.moneySumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      |  CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_quantity < 50
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** P1/P2/P5/P7: filter + projection with derived column. */
  def filterProject: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_discount").between(0.02, 0.06) && col("l_quantity") < 10)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val filterProjectSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) AS revenue
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** J1/J2-shape: inner equi-join chain lineitem⋈orders⋈customer⋈nation⋈region
    * with revenue rollup per nation. nation/region are tiny -> Catalyst
    * broadcasts them (AQE size-based); the big join shuffles on the key.
    */
  def joinRevenueByNation: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = broadcast(Tables.nation(s, d))
    val r = broadcast(Tables.region(s, d))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Num.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val joinRevenueByNationSql: String =
    s"""SELECT r_name, n_name,
      |  ${Num.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** J3-J6-shape: left join that can produce nulls (customers w/o orders),
    * counting only matched rows — the reference's left-join fan-out pattern.
    */
  def leftJoinCustomerOrders: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(Num.moneySum(col("o_totalprice")), lit(0.0)).as("total_spend"))
      .orderBy(col("c_custkey"))
  }

  val leftJoinCustomerOrdersSql: String =
    s"""SELECT c_custkey, c_mktsegment,
      |  count(o_orderkey) AS n_orders,
      |  coalesce(${Num.moneySumSql("o_totalprice")}, 0.0) AS total_spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment
      |ORDER BY c_custkey""".stripMargin

  /** O1: top-k pattern (orderBy desc + limit -> TakeOrderedAndProject).
    * Tie-broken on the key for determinism.
    */
  def topkParts: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("total_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("total_qty").desc, col("l_partkey").asc)
      .limit(20)
  }

  val topkPartsSql: String =
    """SELECT l_partkey,
      |  CAST(sum(l_quantity) AS DOUBLE) AS total_qty,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_partkey
      |ORDER BY total_qty DESC, l_partkey ASC LIMIT 20""".stripMargin

  /** A10: DISTINCT row dedup (reference: dim construction `.distinct()`). */
  def distinctSegments: Q = (s, d) => {
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  val distinctSegmentsSql: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** A5/A6: conditional aggregation (sum of bool cast) + HAVING-style
    * post-aggregation filter (reference: fact_analytics.py:52-55,72).
    */
  def conditionalAgg: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") > 150000, 1).otherwise(0)).cast("long").as("n_big"),
        (Num.moneySum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      .filter(col("n_orders") >= 10)
      .orderBy(col("o_orderpriority"))
  }

  val conditionalAggSql: String =
    s"""SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |  ${Num.moneySumSql("o_totalprice")} / count(*) AS avg_price
      |FROM orders GROUP BY o_orderpriority
      |HAVING count(*) >= 10
      |ORDER BY o_orderpriority""".stripMargin

  /** §2.8 string family: upper/trim/regexp_replace/concat_ws/lpad/length
    * (reference: utils/silver_transformations.py:114-125 drug-name cleanup).
    */
  def scalarString: Q = (s, d) => {
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(trim(col("p_name"))).as("name_upper"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
        length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey"))
  }

  val scalarStringSql: String =
    """SELECT p_partkey,
      |  upper(trim(p_name)) AS name_upper,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
      |  CAST(length(p_name) AS INTEGER) AS name_len
      |FROM part ORDER BY p_partkey""".stripMargin

  /** §2.8 hash family: md5 surrogate key over null-safe stringified business
    * columns (reference: utils/scd_type2.py:54-61).
    */
  def md5SurrogateKey: Q = (s, d) => {
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        md5(concat_ws("||",
          coalesce(col("c_custkey").cast("string"), lit("NULL")),
          coalesce(col("c_name"), lit("NULL")),
          coalesce(col("c_mktsegment"), lit("NULL")))).as("surrogate_key"))
      .orderBy(col("c_custkey"))
  }

  val md5SurrogateKeySql: String =
    """SELECT c_custkey,
      |  md5(concat_ws('||',
      |    coalesce(CAST(c_custkey AS VARCHAR), 'NULL'),
      |    coalesce(c_name, 'NULL'),
      |    coalesce(c_mktsegment, 'NULL'))) AS surrogate_key
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** TPC-H Q3 shape — the classic "filter three tables, shuffle-join,
    * aggregate, top-k" plan: BUILDING-segment customers' orders placed
    * before the cutoff with lines still shipping after it, top-10 by
    * revenue. What the plan must show (PLANS.md): the three selective
    * filters pushed into their scans, the customer side broadcast (it
    * shrinks ~5x before the join), partial aggregation before the
    * (l_orderkey)-keyed exchange, and TakeOrderedAndProject — never a
    * global sort of the aggregated output. Revenue ranks on exact cents,
    * ties broken by order key, so the top-10 is deterministic at every
    * partitioning.
    */
  def shippingPriority: Q = (s, d) => {
    val cutoff = "1998-03-15"
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Num.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"),
        col("revenue"),
        col("o_orderdate").cast("date").cast("string").as("o_orderdate"),
        col("o_orderpriority"))
  }

  val shippingPrioritySql: String =
    s"""SELECT l_orderkey,
      |  ${Num.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
      |  o_orderpriority
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_shipping_priority" -> shippingPriority,
    "q_agg_lineitem" -> aggLineitem,
    "q_filter_project" -> filterProject,
    "q_join_revenue_nation" -> joinRevenueByNation,
    "q_left_join_cust_orders" -> leftJoinCustomerOrders,
    "q_topk_parts" -> topkParts,
    "q_distinct_segments" -> distinctSegments,
    "q_conditional_agg" -> conditionalAgg,
    "q_scalar_string" -> scalarString,
    "q_md5_surrogate" -> md5SurrogateKey,
  )

  val oracles: Map[String, String] = Map(
    "q_shipping_priority" -> shippingPrioritySql,
    "q_agg_lineitem" -> aggLineitemSql,
    "q_filter_project" -> filterProjectSql,
    "q_join_revenue_nation" -> joinRevenueByNationSql,
    "q_left_join_cust_orders" -> leftJoinCustomerOrdersSql,
    "q_topk_parts" -> topkPartsSql,
    "q_distinct_segments" -> distinctSegmentsSql,
    "q_conditional_agg" -> conditionalAggSql,
    "q_scalar_string" -> scalarStringSql,
    "q_md5_surrogate" -> md5SurrogateKeySql,
  )
}
