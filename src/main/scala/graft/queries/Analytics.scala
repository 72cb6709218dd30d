package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Remaining aggregate/source operator coverage from SURVEY.md §2: A3
  * distinct-count, A6 percentage-of-total with a driver-collected scalar,
  * A7 global summary row, A8 min/max, A9 boolean rates, plus S1 (the FAERS
  * `$`-separated CSV source) and S3/S4 (partitioned sink + latest-partition
  * incremental read) exercised round-trip.
  */
object Analytics {

  type Q = (SparkSession, String) => DataFrame

  /** A6: percentage-of-total with the total pre-computed on the driver —
    * deliberately the reference's two-query pattern
    * (fact_analytics.py:150-158), not a window/subquery.
    */
  def pctOfTotal: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val total = orders.count()
    orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("pct_of_total",
        Num.roundAt(2)(col("n_orders") * 100.0 / total))
      .orderBy(col("o_orderpriority"))
  }

  val pctOfTotalSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_orders,
      |  ${Num.roundAtSql(2, "CAST(count(*) AS DOUBLE) * 100.0 / (SELECT count(*) FROM orders)")} AS pct_of_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** A7: single global summary row (9-aggregate pattern,
    * fact_analytics.py:208-222).
    */
  def globalSummary: Q = (s, d) => {
    Tables.orders(s, d).agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"),
      countDistinct(col("o_orderpriority")).as("n_priorities"),
      Num.moneySum(col("o_totalprice")).as("sum_price"),
      (Num.moneySum(col("o_totalprice")) / count(lit(1))).as("avg_price"),
      min(col("o_orderdate")).cast("string").as("first_order"),
      max(col("o_orderdate")).cast("string").as("last_order"),
      sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_finished"))
  }

  val globalSummarySql: String =
    s"""SELECT count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(DISTINCT o_orderpriority) AS n_priorities,
      |  ${Num.moneySumSql("o_totalprice")} AS sum_price,
      |  ${Num.moneySumSql("o_totalprice")} / count(*) AS avg_price,
      |  CAST(min(o_orderdate) AS VARCHAR) AS first_order,
      |  CAST(max(o_orderdate) AS VARCHAR) AS last_order,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
      |FROM orders""".stripMargin

  /** A3: distinct-count per group. */
  def distinctCount: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  val distinctCountSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** A9: boolean-cast rates (dim_drug.py:265-271 pattern). Rates are exact
    * int-count ratios so they hash-match (see Num).
    */
  def boolRate: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        Num.roundAt(4)(sum((col("l_quantity") > 25).cast("int")).cast("double") / count(lit(1)))
          .as("big_qty_rate"),
        Num.roundAt(4)(sum((col("l_discount") > 0.05).cast("int")).cast("double") / count(lit(1)))
          .as("discounted_rate"))
      .orderBy(col("l_returnflag"))
  }

  val boolRateSql: String =
    s"""SELECT l_returnflag,
      |  ${Num.roundAtSql(4, "CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS big_qty_rate,
      |  ${Num.roundAtSql(4, "CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS discounted_rate
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** A8: min/max aggregates per group (dim_date.py:224-225 pattern). */
  def minmaxDates: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        min(col("o_orderdate")).cast("string").as("first_order"),
        max(col("o_orderdate")).cast("string").as("last_order"),
        Num.moneySum(col("o_totalprice")).as("year_revenue"))
      .orderBy(col("order_year"))
  }

  val minmaxDatesSql: String =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |  CAST(min(o_orderdate) AS VARCHAR) AS first_order,
      |  CAST(max(o_orderdate) AS VARCHAR) AS last_order,
      |  ${Num.moneySumSql("o_totalprice")} AS year_revenue
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** S1: the reference's CSV source contract — `$`-separated, header,
    * PERMISSIVE, explicit all-string schema (ingest_demographics.py:53-60) —
    * verified by a lossless round-trip: nation → CSV → read → join region →
    * rollup. The oracle computes the same rollup straight from parquet, so
    * any reader/writer asymmetry breaks the hash.
    */
  def csvRoundtrip: Q = (s, d) => {
    val tmp = Scratch.dir("graft_csv")
    Tables.nation(s, d)
      .select(col("n_nationkey").cast("string"), col("n_name"),
        col("n_regionkey").cast("string"))
      .coalesce(1)
      .write.mode("overwrite").option("sep", "$").option("header", "true").csv(tmp)
    val schema = StructType(Seq("n_nationkey", "n_name", "n_regionkey")
      .map(StructField(_, StringType, nullable = true)))
    val back = s.read
      .option("sep", "$").option("header", "true").option("mode", "PERMISSIVE")
      .schema(schema).csv(tmp)
    back.join(broadcast(Tables.region(s, d)),
        back("n_regionkey").cast("int") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_nation"))
      .orderBy(col("r_name"))
  }

  val csvRoundtripSql: String =
    """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** S3+S4: partitioned append sink + latest-partition incremental read
    * (silver_transformations.py:21-45): write events under two synthetic
    * `_ingest_dt` partitions, eagerly resolve MAX(_ingest_dt), filter on the
    * partition column (metadata-only prune), aggregate the survivors.
    */
  def latestPartition: Q = (s, d) => {
    val tmp = Scratch.dir("graft_part")
    Tables.events(s, d)
      .withColumn("_ingest_dt",
        when(col("event_id") % 3 === 0, lit("2024-01-02")).otherwise(lit("2024-01-01")))
      .write.mode("overwrite").partitionBy("_ingest_dt").parquet(tmp)
    val t = s.read.parquet(tmp)
    val latest = t.agg(max(col("_ingest_dt"))).collect()(0).get(0)
    t.filter(col("_ingest_dt") === lit(latest))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val latestPartitionSql: String =
    """SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
      |FROM events WHERE event_id % 3 = 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Pearson correlation per group from EXACT integer moments (n, Σx, Σy,
    * Σx², Σy², Σxy as longs — order-free partial aggregates), the same
    * discipline as [[TrainPrepOps.outlierZscore]]: built-in `corr()` sums
    * doubles and its partial merges are partition-order dependent, so it
    * cannot hash-match an oracle nor reproduce bit-identically at 1000
    * executors. One scan, one partial-aggregated exchange; the float math
    * happens once per GROUP on the six exact sums, identically on both
    * engines. Quantities are integral by data contract; prices round to
    * whole dollars, and the square/cross moments accumulate in
    * DecimalType(38,0) (Spark) / HUGEINT (DuckDB) — a long Σy² wraps
    * silently past ~SF 1500, which is inside this engine's design scale.
    */
  def corrMoments: Q = (s, d) => {
    val x = col("l_quantity").cast("long")
    val y = round(col("l_extendedprice")).cast("long")
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        // cross-products exceed Long range (n·Σy² ~ 4e20 at sf0.1), so the
        // exact long sums are cast to double FIRST; the products then round
        // per IEEE-754, identically on both engines. Presentation rounding
        // is the repo-wide arithmetic half-up (Num.roundAt) — builtin
        // round() disagrees across engines at exact .5 boundaries
        Num.roundAt(6)(
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              sqrt(col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double")))
        ).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  val corrMomentsSql: String =
    s"""WITH b AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice) AS BIGINT) AS y FROM lineitem),
      |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      |  FROM b GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ${Num.roundAtSql(6,
        """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |       CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |       CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))""")} AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_corr_moments" -> corrMoments,
    "q_pct_of_total" -> pctOfTotal,
    "q_global_summary" -> globalSummary,
    "q_distinct_count" -> distinctCount,
    "q_bool_rate" -> boolRate,
    "q_minmax_dates" -> minmaxDates,
    "q_csv_roundtrip" -> csvRoundtrip,
    "q_latest_partition" -> latestPartition,
  )

  val oracles: Map[String, String] = Map(
    "q_corr_moments" -> corrMomentsSql,
    "q_pct_of_total" -> pctOfTotalSql,
    "q_global_summary" -> globalSummarySql,
    "q_distinct_count" -> distinctCountSql,
    "q_bool_rate" -> boolRateSql,
    "q_minmax_dates" -> minmaxDatesSql,
    "q_csv_roundtrip" -> csvRoundtripSql,
    "q_latest_partition" -> latestPartitionSql,
  )
}
