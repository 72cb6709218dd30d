package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Set operations and multi-dimensional aggregation.
  *
  * The reference itself uses none of these (SURVEY.md §2.7 "None"), but a
  * complete engine needs them: UNION/INTERSECT/EXCEPT, ROLLUP/CUBE/GROUPING
  * SETS, pivot, and exact interpolated percentiles. All are Catalyst
  * built-ins — distinct-based set ops compile to hash aggregates, rollup/cube
  * to a single Expand + hash-agg (one shuffle regardless of grouping-set
  * count, which is what makes them usable at 100 TB vs N separate queries
  * unioned).
  *
  * Grand-total / subtotal rows surface the grouping columns coalesced to
  * `(all)` / `-1` sentinels rather than raw NULLs so oracle hash-compares are
  * unambiguous (the driver's canonical sort does not need to agree on NULL
  * ordering).
  */
object SetGroupOps {

  type Q = (SparkSession, String) => DataFrame

  /** UNION ALL of two tagged projections, rolled up — the medallion pattern
    * of appending heterogeneous batches into one table.
    */
  def unionAll: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val big = o.filter(col("o_totalprice") > 200000)
      .select(col("o_orderpriority"), lit("big").as("bucket"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderpriority"), lit("urgent").as("bucket"))
    big.unionByName(urgent)
      .groupBy(col("bucket"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"), col("o_orderpriority"))
  }

  val unionAllSql: String =
    """SELECT bucket, o_orderpriority, count(*) AS n FROM (
      |  SELECT o_orderpriority, 'big' AS bucket FROM orders WHERE o_totalprice > 200000
      |  UNION ALL
      |  SELECT o_orderpriority, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY bucket, o_orderpriority ORDER BY bucket, o_orderpriority""".stripMargin

  /** INTERSECT (distinct semantics): nations having both customers and
    * suppliers.
    */
  def intersectKeys: Q = (s, d) => {
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))
  }

  val intersectKeysSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** EXCEPT (distinct semantics): parts never shipped. */
  def exceptKeys: Q = (s, d) => {
    Tables.part(s, d).select(col("p_partkey").as("partkey"))
      .except(Tables.lineitem(s, d).select(col("l_partkey").as("partkey")))
      .orderBy(col("partkey"))
  }

  val exceptKeysSql: String =
    """SELECT p_partkey AS partkey FROM part
      |EXCEPT
      |SELECT l_partkey FROM lineitem
      |ORDER BY partkey""".stripMargin

  /** ROLLUP over (returnflag, linestatus): detail + per-flag subtotal + grand
    * total in ONE shuffle (Expand multiplies rows by #grouping-sets map-side;
    * partial aggregation keeps the shuffle small).
    */
  def rollupAgg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"), Num.moneySum(col("l_extendedprice")).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n_lines"), col("sum_price"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  val rollupAggSql: String =
    s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |  coalesce(l_linestatus, '(all)') AS linestatus,
      |  count(*) AS n_lines,
      |  ${Num.moneySumSql("l_extendedprice")} AS sum_price
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE over (priority, status): all 4 grouping sets, still one shuffle. */
  def cubeAgg: Q = (s, d) => {
    Tables.orders(s, d)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), Num.moneySum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("priority"), col("status"))
  }

  val cubeAggSql: String =
    s"""SELECT coalesce(o_orderpriority, '(all)') AS priority,
      |  coalesce(o_orderstatus, '(all)') AS status,
      |  count(*) AS n_orders,
      |  ${Num.moneySumSql("o_totalprice")} AS sum_price
      |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** Explicit GROUPING SETS: (segment×nation), (segment), () — the general
    * form rollup/cube specialize.
    */
  def groupingSets: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("gs_customer")
    s.sql(
      """SELECT coalesce(c_mktsegment, '(all)') AS segment,
        |  coalesce(CAST(c_nationkey AS STRING), '(all)') AS nationkey,
        |  count(1) AS n_customers
        |FROM gs_customer
        |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
        |ORDER BY segment, nationkey""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT coalesce(c_mktsegment, '(all)') AS segment,
      |  coalesce(CAST(c_nationkey AS VARCHAR), '(all)') AS nationkey,
      |  count(*) AS n_customers
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
      |ORDER BY segment, nationkey""".stripMargin

  /** Pivot: returnflag × linestatus counts as columns. Explicit value list
    * (`Seq("F","O")`) — at scale an implicit pivot needs a distinct-scan
    * first, so pinning values keeps it one pass.
    */
  def pivotStatus: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O"))
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o"))
      .orderBy(col("l_returnflag"))
  }

  val pivotStatusSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact interpolated percentiles (quartiles of quantity per flag).
    * `percentile` is Spark's exact sort-based aggregate — fine per-group at
    * any scale since each group sorts independently post-shuffle; for a
    * single global percentile at 100 TB prefer `percentile_approx`.
    */
  def percentiles: Q = (s, d) => {
    // array-form percentile: ONE sort of l_quantity serves all three
    // quartiles (three scalar calls would sort the group three times).
    // The price median interpolates over integer CENTS: with exact-integer
    // inputs and power-of-two quantile fractions every interpolation
    // intermediate is exactly representable, so the result is identical
    // regardless of how an engine associates `a + (b-a)f` vs
    // `a(1-f) + bf` — interpolating the raw price doubles is not (it
    // diverged from the oracle at tiny group sizes).
    Tables.lineitem(s, d)
      .withColumn("price_cents", Num.cents(col("l_extendedprice")))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("qs"),
        (expr("percentile(price_cents, 0.5)") / 100.0).as("median_price"))
      .select(col("l_returnflag"),
        round(element_at(col("qs"), 1), 4).as("q25"),
        round(element_at(col("qs"), 2), 4).as("q50"),
        round(element_at(col("qs"), 3), 4).as("q75"),
        col("median_price"))
      .orderBy(col("l_returnflag"))
  }

  val percentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 4) AS q25,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS q50,
      |  round(quantile_cont(l_quantity, 0.75), 4) AS q75,
      |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) / 100.0
      |    AS median_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Unpivot (melt): wide per-flag lineitem metrics to long (metric, value)
    * rows — the inverse of [[pivotStatus]]; at scale this is a zero-shuffle
    * Expand (rows × #metrics) feeding the usual partial aggregation.
    */
  def unpivotMetrics: Q = (s, d) => {
    val wide = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        Num.moneySum(col("l_extendedprice")).as("gross"),
        Num.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"),
        Num.moneySum(col("l_extendedprice") * col("l_tax")).as("tax"))
    wide.unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("gross"), col("net"), col("tax")),
        variableColumnName = "metric", valueColumnName = "amount")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  val unpivotMetricsSql: String =
    s"""WITH wide AS (
      |  SELECT l_returnflag,
      |    ${Num.moneySumSql("l_extendedprice")} AS gross,
      |    ${Num.moneySumSql("l_extendedprice * (1 - l_discount)")} AS net,
      |    ${Num.moneySumSql("l_extendedprice * l_tax")} AS tax
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, metric, amount
      |FROM wide UNPIVOT (amount FOR metric IN (gross, net, tax))
      |ORDER BY l_returnflag, metric""".stripMargin

  /** Equi-width histogram of order totals: fixed range [0, 600k), 20
    * buckets, overflow clamped to the top bucket. Fixed bounds keep it ONE
    * pass — a data-driven min/max needs a prior scan; at 100 TB you take
    * bounds from table stats (ANALYZE) instead.
    */
  def histogram: Q = (s, d) => {
    val width = 600000.0 / 20
    Tables.orders(s, d)
      .withColumn("bucket",
        least(floor(col("o_totalprice") / width), lit(19)).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        Num.moneySum(col("o_totalprice")).as("sum_price"))
      .withColumn("bucket_lo", (col("bucket") * width).cast("double"))
      .select(col("bucket"), col("bucket_lo"), col("n_orders"), col("sum_price"))
      .orderBy(col("bucket"))
  }

  val histogramSql: String =
    s"""SELECT CAST(least(floor(o_totalprice / 30000.0), 19) AS INTEGER) AS bucket,
      |  CAST(least(floor(o_totalprice / 30000.0), 19) * 30000.0 AS DOUBLE) AS bucket_lo,
      |  count(*) AS n_orders,
      |  ${Num.moneySumSql("o_totalprice")} AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY bucket""".stripMargin

  /** ORDERED STRING AGGREGATION (group_concat / string_agg): per
    * (segment, nation) group, the count plus a '|'-joined sample of the
    * 3 lexicographically-first customer names. `collect_list` is
    * arrival-order-nondeterministic, so the list is sorted then sliced
    * BEFORE joining — the only formulation whose output is partition-
    * invariant (DuckDB mirrors it with `array_agg(... ORDER BY ...)`).
    *
    * SCALE: collect_list buffers each group in executor memory — fine for
    * bounded groups (here |customers| per (segment, nation) ≈ hundreds);
    * for unbounded groups the engine's `graft_topk` heap aggregate is the
    * bounded-memory drop-in (keeps k, spills nothing), which is why the
    * sample is capped at 3 names rather than concatenating the group.
    */
  def groupConcat: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        array_join(slice(array_sort(collect_list(col("c_name"))), 1, 3), "|")
          .as("sample_names"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  val groupConcatSql: String =
    """SELECT c_mktsegment, c_nationkey, count(*) AS n_customers,
      |  array_to_string((array_agg(c_name ORDER BY c_name))[1:3], '|')
      |    AS sample_names
      |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_group_concat" -> groupConcat,
    "q_histogram" -> histogram,
    "q_unpivot" -> unpivotMetrics,
    "q_union_all" -> unionAll,
    "q_intersect" -> intersectKeys,
    "q_except" -> exceptKeys,
    "q_rollup" -> rollupAgg,
    "q_cube" -> cubeAgg,
    "q_grouping_sets" -> groupingSets,
    "q_pivot" -> pivotStatus,
    "q_percentiles" -> percentiles,
  )

  val oracles: Map[String, String] = Map(
    "q_group_concat" -> groupConcatSql,
    "q_histogram" -> histogramSql,
    "q_unpivot" -> unpivotMetricsSql,
    "q_union_all" -> unionAllSql,
    "q_intersect" -> intersectKeysSql,
    "q_except" -> exceptKeysSql,
    "q_rollup" -> rollupAggSql,
    "q_cube" -> cubeAggSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_pivot" -> pivotStatusSql,
    "q_percentiles" -> percentilesSql,
  )
}
