package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** SQL-surface operators exercised through `spark.sql` over temp views:
  * correlated scalar subqueries, LATERAL top-n, null-safe equality joins,
  * and blocked fuzzy matching. These prove the engine's SQL front door —
  * Catalyst decorrelates the subqueries into the same join shapes the
  * DataFrame API would produce (no per-row re-execution: a correlated
  * scalar subquery becomes one aggregate + one left join).
  */
object SqlSurfaceOps {

  type Q = (SparkSession, String) => DataFrame

  private def views(s: SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.part(s, d).createOrReplaceTempView("part_v")
    Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
  }

  /** Correlated scalar subquery — decorrelated by Catalyst into
    * aggregate-then-left-join (one shuffle, not one query per row).
    */
  def scalarSubquery: Q = (s, d) => {
    views(s, d)
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |  coalesce((SELECT max(o_totalprice) FROM orders_v
        |            WHERE o_custkey = c_custkey), 0.0) AS max_order
        |FROM customer_v ORDER BY c_custkey""".stripMargin)
  }

  val scalarSubquerySql: String =
    """SELECT c_custkey, c_mktsegment,
      |  coalesce((SELECT max(o_totalprice) FROM orders
      |            WHERE o_custkey = c_custkey), 0.0) AS max_order
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** LATERAL correlated subquery with ORDER BY + LIMIT: top-2 orders per
    * customer. Catalyst decorrelates to a partitioned window filter —
    * the per-key top-n never runs row-at-a-time.
    */
  def lateralTopn: Q = (s, d) => {
    views(s, d)
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer_v,
        |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders_v
        |           WHERE o_custkey = c_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  val lateralTopnSql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer,
      |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |           WHERE o_custkey = c_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** Null-safe equality join (`<=>` ≡ IS NOT DISTINCT FROM): null keys
    * match each other, unlike the reference's `=` join semantics (which
    * Scd2 preserves — this query covers the OTHER choice).
    */
  def nullSafeJoin: Q = (s, d) => {
    views(s, d)
    s.sql(
      """WITH c AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
        |                       ELSE c_nationkey END AS nk FROM customer_v),
        |     s AS (SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL
        |                       ELSE s_nationkey END AS nk FROM supplier_v)
        |SELECT c.nk AS nationkey, count(*) AS n_pairs
        |FROM c JOIN s ON c.nk <=> s.nk
        |GROUP BY c.nk ORDER BY nationkey NULLS FIRST""".stripMargin)
  }

  val nullSafeJoinSql: String =
    """WITH c AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
      |                       ELSE c_nationkey END AS nk FROM customer),
      |     s AS (SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL
      |                       ELSE s_nationkey END AS nk FROM supplier)
      |SELECT c.nk AS nationkey, count(*) AS n_pairs
      |FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
      |GROUP BY c.nk ORDER BY nationkey NULLS FIRST""".stripMargin

  /** Blocked fuzzy match: near-identical part names within a brand at edit
    * distance ≤ 2, answered by [[graft.ops.Dedup.edJoinPairs]] — positional
    * q-gram prefix filtering (Ed-Join) generates candidates sharing a rare
    * gram instead of the block-quadratic self-join the oracle SQL spells
    * out; the levenshtein verify makes the two formulations row-identical
    * (recall of the prefix filter is exactly 1, see edJoinPairs).
    */
  def fuzzyMatch: Q = (s, d) => {
    import org.apache.spark.sql.functions.col
    graft.ops.Dedup.edJoinPairs(
        Tables.part(s, d).filter(col("p_partkey") % 4 === 0),
        "p_partkey", "p_name", Seq("p_brand"), maxDist = 2, q = 3)
      .select(col("id_a"), col("id_b"), col("str_a").as("name_a"),
        col("str_b").as("name_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val fuzzyMatchSql: String =
    """WITH p AS (SELECT * FROM part WHERE p_partkey % 4 = 0)
      |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
      |FROM p a JOIN p b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
      |  AND levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  /** Semi-structured extraction: events.props carries a JSON payload;
    * `from_json` with an explicit schema parses it ONCE into a struct
    * (schema'd parse — `get_json_object` re-parses per path at scale).
    */
  def jsonProps: Q = (s, d) => {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    Tables.events(s, d)
      .withColumn("p", from_json(col("props"),
        StructType(Seq(StructField("k", IntegerType)))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("p.k")).cast("long").as("sum_k"),
        min(col("p.k")).as("min_k"),
        max(col("p.k")).as("max_k"),
        countDistinct(col("p.k")).as("n_distinct_k"))
      .orderBy(col("event_type"))
  }

  val jsonPropsSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
      |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_distinct_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): generate weekly anchors by
    * recursion, then count events per week — the linear-recursion shape
    * (hierarchies, BOM explosions, chain-walks) the reference never needed
    * but a complete SQL engine must run.
    */
  def recursiveCte: Q = (s, d) => {
    views(s, d)
    Tables.events(s, d).createOrReplaceTempView("events_sql_v")
    s.sql(
      """WITH RECURSIVE weeks(week_start) AS (
        |  SELECT DATE '2024-01-01'
        |  UNION ALL
        |  SELECT CAST(week_start + INTERVAL 7 DAY AS DATE) FROM weeks
        |  WHERE week_start < DATE '2024-01-22')
        |SELECT CAST(week_start AS STRING) AS week_start,
        |  count(event_id) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM weeks LEFT JOIN events_sql_v
        |  ON ts >= week_start AND ts < week_start + INTERVAL 7 DAY
        |GROUP BY week_start ORDER BY week_start""".stripMargin)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE weeks(week_start) AS (
      |  SELECT DATE '2024-01-01'
      |  UNION ALL
      |  SELECT CAST(week_start + INTERVAL 7 DAY AS DATE) FROM weeks
      |  WHERE week_start < DATE '2024-01-22')
      |SELECT strftime(week_start, '%Y-%m-%d') AS week_start,
      |  count(event_id) AS n_events,
      |  count(DISTINCT user_id) AS n_users
      |FROM weeks LEFT JOIN events
      |  ON ts >= week_start AND ts < week_start + INTERVAL 7 DAY
      |GROUP BY week_start ORDER BY week_start""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_json_props" -> jsonProps,
    "q_recursive_cte" -> recursiveCte,
    "q_scalar_subquery" -> scalarSubquery,
    "q_lateral_topn" -> lateralTopn,
    "q_null_safe_join" -> nullSafeJoin,
    "q_fuzzy_match" -> fuzzyMatch,
  )

  val oracles: Map[String, String] = Map(
    "q_json_props" -> jsonPropsSql,
    "q_recursive_cte" -> recursiveCteSql,
    "q_scalar_subquery" -> scalarSubquerySql,
    "q_lateral_topn" -> lateralTopnSql,
    "q_null_safe_join" -> nullSafeJoinSql,
    "q_fuzzy_match" -> fuzzyMatchSql,
  )
}
