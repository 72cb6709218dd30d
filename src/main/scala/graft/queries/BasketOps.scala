package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Market-basket association mining over order line items: for every pair
  * of parts co-purchased in ≥ 2 orders, the classic rule metrics —
  * support `P(A∧B)`, confidence `P(B|A)`, lift
  * `P(A∧B) / (P(A)·P(B))` (Agrawal & Srikant's Apriori family, VLDB'94;
  * this is the 2-itemset level, the one that matters for co-occurrence
  * analytics and negative-sampling tables in recommender training sets).
  *
  * SCALE design:
  *  - Baskets dedup to distinct (order, part) — one hash shuffle.
  *  - Pair generation is a self-equi-join ON THE ORDER KEY: co-partitioned
  *    both sides, per-basket quadratic only (TPC-H baskets are ≤ 7 items;
  *    a 100 TB order history stays Σ basket² ≈ linear), never
  *    corpus-quadratic. AQE handles viral-basket skew.
  *  - Pair counts and per-part supports are partial-aggregated hash aggs;
  *    the metric join keys on single part ids.
  *  - Basket total N is ONE driver scalar (the sanctioned eager-scalar
  *    pattern, cf. A1/A6) feeding exact integer-over-integer double
  *    division — bit-identical across engines since all operands are
  *    < 2⁵³ and exactly represented.
  *  - Top-100 by (n_ab desc, part_a, part_b) — a unique total order, so
  *    the LIMIT boundary is deterministic on both engines.
  */
object BasketOps {

  type Q = (SparkSession, String) => DataFrame

  def assocRules: Q = (s, d) => {
    // ONE lineitem scan for the whole query (guide §6 scan reuse): the
    // old form planned the scan+distinct subtree FOUR times (basket-count
    // action, two support broadcasts, self-join probe). Hash the raw
    // (okey, pkey) stream on okey up front — HashPartitioning(okey)
    // satisfies both the distinct's {okey, pkey} clustering and the
    // self-join's okey clustering (§2.4 shared exchange) — and checkpoint
    // the deduped baskets so every consumer reads the materialized rows.
    val items = graft.core.Checkpoint(Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .repartition(col("okey"))
      .distinct())
    val nBaskets = items.select(col("okey")).distinct().count()
    val supports = items.groupBy(col("pkey")).agg(count(lit(1)).as("n_p"))
    val a = items.alias("a")
    val b = items.alias("b")
    val pairs = a.join(b, col("a.okey") === col("b.okey") &&
        col("a.pkey") < col("b.pkey"))
      .groupBy(col("a.pkey").as("part_a"), col("b.pkey").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(supports.select(col("pkey").as("part_a"), col("n_p").as("n_a")), "part_a")
      .join(supports.select(col("pkey").as("part_b"), col("n_p").as("n_b")), "part_b")
      .select(col("part_a"), col("part_b"), col("n_ab"),
        Num.roundAt(6)(col("n_ab").cast("double") / nBaskets).as("support"),
        Num.roundAt(6)(col("n_ab").cast("double") / col("n_a")).as("confidence"),
        Num.roundAt(6)((col("n_ab") * nBaskets).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  val assocRulesSql: String =
    s"""WITH items AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
      |n AS (SELECT count(DISTINCT okey) AS n_baskets FROM items),
      |supp AS (SELECT pkey, count(*) AS n_p FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.pkey AS part_a, b.pkey AS part_b, count(*) AS n_ab
      |  FROM items a JOIN items b ON a.okey = b.okey AND a.pkey < b.pkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT part_a, part_b, n_ab,
      |  ${Num.roundAtSql(6, "CAST(n_ab AS DOUBLE) / n_baskets")} AS support,
      |  ${Num.roundAtSql(6, "CAST(n_ab AS DOUBLE) / sa.n_p")} AS confidence,
      |  ${Num.roundAtSql(6, "CAST(n_ab * n_baskets AS DOUBLE) / CAST(sa.n_p * sb.n_p AS DOUBLE)")} AS lift
      |FROM pairs
      |JOIN supp sa ON sa.pkey = part_a
      |JOIN supp sb ON sb.pkey = part_b
      |CROSS JOIN n
      |ORDER BY n_ab DESC, part_a, part_b LIMIT 100""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_assoc_rules" -> assocRules,
  )

  val oracles: Map[String, String] = Map(
    "q_assoc_rules" -> assocRulesSql,
  )
}
