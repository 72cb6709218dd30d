package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Join variants beyond the reference's plain equi-joins (SURVEY §2.3): semi,
  * anti, as-of, and range joins — each expressed in the form that survives a
  * 100 TB scale-up.
  *
  * - semi/anti: `left_semi`/`left_anti` join types — Catalyst plans one
  *   shuffled (or broadcast) hash join probing for existence; never
  *   materializes the match fan-out the way `JOIN + DISTINCT` would.
  * - as-of: NOT the naive point-in-time cross join (quadratic per key).
  *   Union both streams, one shuffle on the key, and carry the latest quote
  *   forward with `last(ignoreNulls)` over an ordered window — cost is one
  *   shuffle + one per-key sort regardless of how skewed the time series is.
  * - range: interval join re-expressed as bucket equi-join + residual
  *   predicate. A raw `ts BETWEEN start AND end` join gives Catalyst nothing
  *   to hash on (falls back to broadcast-nested-loop); bucketing the
  *   intervals to days makes it a plain equi-join that AQE can size.
  */
object JoinOps {

  type Q = (SparkSession, String) => DataFrame

  /** Left-semi: orders with at least one deep-discount line. The plan probes
    * lineitem's build side for existence — no fan-out, no dedup pass.
    */
  def semiJoin: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val deep = Tables.lineitem(s, d).filter(col("l_discount") >= 0.09)
    o.join(deep, o("o_orderkey") === deep("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Num.moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  val semiJoinSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_orders,
      |  ${Num.moneySumSql("o_totalprice")} AS sum_price
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left-anti: customers who never ordered. */
  def antiJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), min(col("c_custkey")).as("min_custkey"))
      .orderBy(col("c_mktsegment"))
  }

  val antiJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers, min(c_custkey) AS min_custkey
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** As-of join: each click event picks up the user's most recent
    * purchase value at or before the click (ties on ts broken by highest
    * event_id, purchases visible to same-instant clicks).
    *
    * Scale shape: union(purchases, clicks) → single hash shuffle on user_id
    * → per-key sort → `last(ignoreNulls)` carry-forward. Linear in events,
    * robust to per-user skew; contrast with the quadratic
    * join-then-rank-then-filter formulation.
    */
  def asofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"),
        lit(null).cast("double").as("purchase_value"))
    // tag orders purchases before clicks at equal ts (>= as-of semantics);
    // event_id tie-breaks simultaneous purchases deterministically.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_purchase_value",
        last(col("purchase_value"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        round(coalesce(col("last_purchase_value"), lit(-1.0)), 6).as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """SELECT c.event_id, c.user_id,
      |  strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      |  round(coalesce((
      |    SELECT p.value FROM events p
      |    WHERE p.event_type = 'purchase' AND p.user_id = c.user_id AND p.ts <= c.ts
      |    ORDER BY p.ts DESC, p.event_id DESC LIMIT 1), -1.0), 6) AS last_purchase_value
      |FROM events c WHERE c.event_type = 'click'
      |ORDER BY c.event_id""".stripMargin

  /** Range join: events × 12 promo windows (36 h long, every 60 h). The
    * window spec is exploded to the calendar days it covers, equi-joined on
    * the event's day, then the exact `[start, end)` predicate filters the
    * residue — turning an un-hashable interval join into a shuffle-hash join
    * whose fan-out is bounded by days-per-interval.
    */
  def rangeJoin: Q = (s, d) => {
    val windows = s.range(12)
      .select(col("id").cast("int").as("w_id"))
      .withColumn("w_start",
        to_timestamp(lit("2024-01-01 00:00:00")) + expr("make_interval(0,0,0,0,60,0,0) * w_id"))
      .withColumn("w_end", col("w_start") + expr("interval 36 hours"))
      .withColumn("day",
        explode(sequence(to_date(col("w_start")), to_date(col("w_end")))))
    val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
    ev.join(broadcast(windows), Seq("day"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy(col("w_id"), col("w_start"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("w_id"), col("w_start").cast("string").as("w_start"),
        col("n_events"), col("n_users"))
      .orderBy(col("w_id"))
  }

  val rangeJoinSql: String =
    """WITH windows AS (
      |  SELECT CAST(k AS INTEGER) AS w_id,
      |    TIMESTAMP '2024-01-01 00:00:00' + k * INTERVAL 60 HOUR AS w_start,
      |    TIMESTAMP '2024-01-01 00:00:00' + k * INTERVAL 60 HOUR + INTERVAL 36 HOUR AS w_end
      |  FROM (SELECT unnest(generate_series(0, 11)) AS k))
      |SELECT w_id, CAST(w_start AS VARCHAR) AS w_start,
      |  count(*) AS n_events, count(DISTINCT user_id) AS n_users
      |FROM events JOIN windows ON ts >= w_start AND ts < w_end
      |GROUP BY w_id, w_start ORDER BY w_id""".stripMargin

  /** Full-outer join of two independently-aggregated event streams on the
    * day key: daily purchase revenue ⟗ daily error counts, classifying each
    * day as matched / revenue-only / errors-only. The reconciliation shape —
    * "which days exist in stream A, stream B, or both, and what do the
    * unmatched sides look like" — is the canonical full-outer use and the
    * one join type the registry didn't yet gate directly.
    *
    * Scale: both inputs are pre-aggregated to day grain BEFORE the join
    * (map-side partial → one shuffle each on the tiny day key), so the
    * full-outer itself joins two |days|-row relations — a broadcast-able
    * afterthought no matter how large the raw event streams are. Joining
    * raw-to-raw and aggregating after would shuffle the full fact twice
    * and explode the M:N day match; this form never materializes it.
    */
  def fullOuterJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val buys = ev.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_buys"), Num.microSum(col("value")).as("revenue"))
    val errs = ev.filter(col("event_type") === "error")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_errors"))
    buys.join(errs, Seq("day"), "full_outer")
      .select(col("day").cast("string").as("day"),
        coalesce(col("n_buys"), lit(0L)).as("n_buys"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"),
        when(col("n_buys").isNotNull && col("n_errors").isNotNull, "both")
          .when(col("n_buys").isNotNull, "revenue_only")
          .otherwise("errors_only").as("presence"))
      .orderBy(col("day"))
  }

  val fullOuterJoinSql: String =
    s"""WITH buys AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_buys,
      |    ${Num.microSumSql("value")} AS revenue
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |errs AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_errors
      |  FROM events WHERE event_type = 'error' GROUP BY 1)
      |SELECT CAST(coalesce(b.day, e.day) AS VARCHAR) AS day,
      |  coalesce(b.n_buys, 0) AS n_buys,
      |  coalesce(b.revenue, 0.0) AS revenue,
      |  coalesce(e.n_errors, 0) AS n_errors,
      |  CASE WHEN b.day IS NOT NULL AND e.day IS NOT NULL THEN 'both'
      |       WHEN b.day IS NOT NULL THEN 'revenue_only'
      |       ELSE 'errors_only' END AS presence
      |FROM buys b FULL OUTER JOIN errs e ON b.day = e.day
      |ORDER BY day""".stripMargin

  /** The same as-of semantics through graft's NATIVE operator
    * ([[graft.plans.AsOfJoin]]: custom LogicalPlan → SparkStrategy →
    * single-pass sort-merge SparkPlan) instead of the union+window
    * composition above. Payload carries TWO right columns (value + the
    * purchase's event_id) to exercise multi-column attach, and the
    * explicit tieBreak pins duplicate-timestamp resolution to the
    * highest purchase event_id — bit-identical to the oracle's
    * `ORDER BY ts DESC, event_id DESC LIMIT 1` lateral.
    */
  def asofNative: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value"))
    graft.plans.AsOfJoin(clicks, purchases, on = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("value", "p_event_id"),
        tieBreak = Seq("p_event_id"),
        // pin the co-partitioned sort-merge form: the plan this gate
        // certifies is the one that runs when BOTH sides are fact-sized
        broadcast = Some(false))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        round(coalesce(col("value"), lit(-1.0)), 6).as("last_purchase_value"),
        coalesce(col("p_event_id"), lit(-1L)).as("purchase_event_id"))
      .orderBy(col("event_id"))
  }

  /** STRICT as-of (`rightTime < leftTime`) through the size-driven
    * planner path — at sf0.01 the purchases side sits under the broadcast
    * threshold, so this executes [[graft.plans.BroadcastAsOfJoinExec]]:
    * zero shuffle and zero sort on the click side, binary-search lookups
    * against the broadcast (key → time-sorted payloads) index. Strictness
    * makes same-instant purchases invisible, which the oracle mirrors
    * with `p.ts < c.ts`.
    */
  def asofBroadcast: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value"))
    graft.plans.AsOfJoin(clicks, purchases, on = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("value", "p_event_id"),
        tieBreak = Seq("p_event_id"), strict = true)
      .select(col("event_id"), col("user_id"),
        round(coalesce(col("value"), lit(-1.0)), 6).as("prior_purchase_value"),
        coalesce(col("p_event_id"), lit(-1L)).as("purchase_event_id"))
      .orderBy(col("event_id"))
  }

  val asofBroadcastSql: String =
    """SELECT c.event_id, c.user_id,
      |  round(coalesce(lp.value, -1.0), 6) AS prior_purchase_value,
      |  CAST(coalesce(lp.p_event_id, -1) AS BIGINT) AS purchase_event_id
      |FROM events c LEFT JOIN LATERAL (
      |  SELECT p.value, p.event_id AS p_event_id FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id AND p.ts < c.ts
      |  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) lp ON TRUE
      |WHERE c.event_type = 'click'
      |ORDER BY c.event_id""".stripMargin

  val asofNativeSql: String =
    """SELECT c.event_id, c.user_id,
      |  strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      |  round(coalesce(lp.value, -1.0), 6) AS last_purchase_value,
      |  CAST(coalesce(lp.p_event_id, -1) AS BIGINT) AS purchase_event_id
      |FROM events c LEFT JOIN LATERAL (
      |  SELECT p.value, p.event_id AS p_event_id FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id AND p.ts <= c.ts
      |  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) lp ON TRUE
      |WHERE c.event_type = 'click'
      |ORDER BY c.event_id""".stripMargin

  /** FORWARD as-of with a TOLERANCE bound, hash-gated: each click picks
    * the NEXT purchase within 7 days (first at-or-after, ties to the
    * lowest purchase id — the merge's natural order), or null when the
    * user never buys again inside the window. Pinned to the
    * co-partitioned sort-merge form; tolerance is micros (timestamp
    * units). Oracle: ascending lateral with the interval bound.
    */
  def asofForward: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value"))
    graft.plans.AsOfJoin(clicks, purchases, on = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("value", "p_event_id"),
        tieBreak = Seq("p_event_id"),
        direction = "forward",
        tolerance = Some(7L * 86400 * 1000000),
        broadcast = Some(false))
      .select(col("event_id"), col("user_id"),
        round(coalesce(col("value"), lit(-1.0)), 6).as("next_purchase_value"),
        coalesce(col("p_event_id"), lit(-1L)).as("purchase_event_id"))
      .orderBy(col("event_id"))
  }

  val asofForwardSql: String =
    """SELECT c.event_id, c.user_id,
      |  round(coalesce(np.value, -1.0), 6) AS next_purchase_value,
      |  CAST(coalesce(np.p_event_id, -1) AS BIGINT) AS purchase_event_id
      |FROM events c LEFT JOIN LATERAL (
      |  SELECT p.value, p.event_id AS p_event_id FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
      |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 7 DAY
      |  ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) np ON TRUE
      |WHERE c.event_type = 'click'
      |ORDER BY c.event_id""".stripMargin

  /** NEAREST as-of, hash-gated: each click attaches the purchase closest
    * in time on either side; equidistant ties resolve BACKWARD, and
    * within one instant backward keeps the highest purchase id while
    * forward keeps the lowest (the merge/tie conventions) — the oracle
    * encodes exactly that with a signed-id tie key. Physical form left
    * to the stats-driven planner.
    */
  def asofNearest: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value"))
    graft.plans.AsOfJoin(clicks, purchases, on = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("value", "p_event_id"),
        tieBreak = Seq("p_event_id"),
        direction = "nearest")
      .select(col("event_id"), col("user_id"),
        round(coalesce(col("value"), lit(-1.0)), 6).as("nearest_purchase_value"),
        coalesce(col("p_event_id"), lit(-1L)).as("purchase_event_id"))
      .orderBy(col("event_id"))
  }

  val asofNearestSql: String =
    """SELECT c.event_id, c.user_id,
      |  round(coalesce(np.value, -1.0), 6) AS nearest_purchase_value,
      |  CAST(coalesce(np.p_event_id, -1) AS BIGINT) AS purchase_event_id
      |FROM events c LEFT JOIN LATERAL (
      |  SELECT p.value, p.event_id AS p_event_id FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
      |  ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)) ASC, p.ts ASC,
      |    CASE WHEN p.ts <= c.ts THEN -p.event_id ELSE p.event_id END ASC
      |  LIMIT 1) np ON TRUE
      |WHERE c.event_type = 'click'
      |ORDER BY c.event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_semi_join" -> semiJoin,
    "q_anti_join" -> antiJoin,
    "q_asof_join" -> asofJoin,
    "q_asof_native" -> asofNative,
    "q_asof_broadcast" -> asofBroadcast,
    "q_asof_forward" -> asofForward,
    "q_asof_nearest" -> asofNearest,
    "q_range_join" -> rangeJoin,
    "q_full_outer_join" -> fullOuterJoin,
  )

  val oracles: Map[String, String] = Map(
    "q_semi_join" -> semiJoinSql,
    "q_anti_join" -> antiJoinSql,
    "q_asof_join" -> asofJoinSql,
    "q_asof_native" -> asofNativeSql,
    "q_asof_broadcast" -> asofBroadcastSql,
    "q_asof_forward" -> asofForwardSql,
    "q_asof_nearest" -> asofNearestSql,
    "q_range_join" -> rangeJoinSql,
    "q_full_outer_join" -> fullOuterJoinSql,
  )
}
