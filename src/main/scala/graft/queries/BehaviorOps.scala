package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Behavioral / product-analytics operators over the event stream: ordered
  * funnels, cohort retention, and spine-complete gap-filled time series.
  * These are the query family every event lake serves daily; none of them
  * exist in the reference (its analytics are star-schema rollups).
  *
  * Scale shapes:
  *  - the funnel is stage-filtered aggregates chained on `user_id` — every
  *    shuffle in the chain uses the SAME key, so one partitioning is
  *    reused end-to-end (no re-exchange between stages under AQE), and
  *    each stage's input shrinks monotonically (stage N joins only stage
  *    N-1 survivors).
  *  - cohort retention is two aggregates on the same key plus one join of
  *    the (tiny) per-user cohort map back onto activity — broadcast here,
  *    co-partitioned at the 10⁹-user scale.
  *  - gap-fill joins the observed series onto the complete (type × day)
  *    spine — the spine is generated, never scanned, and the LOCF carry
  *    is one window per series, linear in spine size.
  *
  * Timestamps follow the engine's determinism rules: day arithmetic on
  * `DateType`, value sums in integer micros ([[EventOps]]' policy).
  */
object BehaviorOps {

  type Q = (SparkSession, String) => DataFrame

  private def microSum(c: org.apache.spark.sql.Column) = Num.microSum(c)
  private val microSumSql = (e: String) => Num.microSumSql(e)

  /** Strict-order funnel view → click → purchase: a user converts a stage
    * only with an event strictly AFTER their previous stage's first
    * qualifying event. Per-stage user counts plus conversion percent
    * against the stage before.
    */
  def funnel: Q = (s, d) => {
    val ev = Tables.events(s, d)
    // each stage feeds both the next stage's join and its own count():
    // checkpoint so the three counts don't re-run the whole chain
    // (uncached, stage 1 would execute three times)
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .transform(graft.core.Checkpoint.apply)
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      .transform(graft.core.Checkpoint.apply)
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val Seq(n1, n2, n3) = Seq(s1, s2, s3).map(_.count())
    // empty-stage guard: 0/0 is NaN, and the engines disagree on rounding
    // NaN — an empty previous stage reports 0.0 conversion on both sides
    def pct(n: Long, prev: Long): Double =
      if (prev == 0) 0.0 else math.round(n * 10000.0 / prev) / 100.0
    import s.implicits._
    Seq(
      (1, "view", n1, 100.0),
      (2, "click", n2, pct(n2, n1)),
      (3, "purchase", n3, pct(n3, n2)))
      .toDF("stage", "event_type", "n_users", "pct_of_prev")
      .orderBy(col("stage"))
  }

  val funnelSql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |    WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |    JOIN s1 ON e.user_id = s1.user_id
      |    WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |    JOIN s2 ON e.user_id = s2.user_id
      |    WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
      |SELECT 1 AS stage, 'view' AS event_type,
      |    (SELECT count(*) FROM s1) AS n_users, 100.0 AS pct_of_prev
      |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2),
      |    CASE WHEN (SELECT count(*) FROM s1) = 0 THEN 0.0 ELSE
      |      floor((SELECT count(*) FROM s2) * 10000.0 / (SELECT count(*) FROM s1) + 0.5) / 100.0 END
      |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3),
      |    CASE WHEN (SELECT count(*) FROM s2) = 0 THEN 0.0 ELSE
      |      floor((SELECT count(*) FROM s3) * 10000.0 / (SELECT count(*) FROM s2) + 0.5) / 100.0 END
      |ORDER BY stage""".stripMargin

  /** Cohort retention: users cohorted by first-ever event day; one row
    * per (cohort day, day offset) with distinct active users. The classic
    * retention triangle, exact counts.
    */
  def cohortRetention: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    // no broadcast hint: the cohort map is O(total users), and a forced
    // broadcast would OOM the driver at 10^9 users; both sides already
    // hash by user_id, so AQE picks broadcast at small SF and a
    // co-partitioned shuffle join at scale
    ev.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day").cast("string").as("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val cohortRetentionSql: String =
    """WITH c AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      |    FROM events GROUP BY user_id),
      |act AS (SELECT DISTINCT e.user_id, c.cohort_day,
      |    date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      |  FROM events e JOIN c ON e.user_id = c.user_id)
      |SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
      |  CAST(day_offset AS INTEGER) AS day_offset,
      |  count(*) AS n_users
      |FROM act GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin

  /** Spine-complete daily series with LOCF gap-fill: rare events (JSON
    * prop k ≥ 95) rolled up per (type, day), left-joined onto the full
    * generated day×type spine; missing days carry 0 counts and the last
    * observed running value forward (`last(..., ignoreNulls)`) — the
    * dashboard-feed shape that turns a sparse event stream into a dense,
    * plot-ready series without scanning anything but the observations.
    */
  def gapFill: Q = (s, d) => {
    val rare = Tables.events(s, d)
      .filter(get_json_object(col("props"), "$.k").cast("int") >= 95)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val daily = rare.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), microSum(col("value")).as("day_value"))
    val bounds = Tables.events(s, d)
      .agg(to_date(min(col("ts"))).as("lo"), to_date(max(col("ts"))).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      .crossJoin(broadcast(daily.select(col("event_type")).distinct()))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value"))
      .withColumn("locf_value",
        coalesce(last(col("day_value"), ignoreNulls = true).over(w), lit(0.0)))
      .drop("day_value")
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("n_events"), col("locf_value"))
      .orderBy(col("event_type"), col("day"))
  }

  val gapFillSql: String =
    s"""WITH rare AS (SELECT event_type, CAST(ts AS DATE) AS day, value
      |    FROM events WHERE CAST(json_extract_string(props, '$$.k') AS INTEGER) >= 95),
      |daily AS (SELECT event_type, day, count(*) AS n_events,
      |    ${microSumSql("value")} AS day_value
      |  FROM rare GROUP BY 1, 2),
      |spine AS (SELECT t.event_type, CAST(s.day AS DATE) AS day
      |  FROM (SELECT DISTINCT event_type FROM daily) t
      |  CROSS JOIN (SELECT unnest(generate_series(
      |      (SELECT CAST(min(ts) AS DATE) FROM events),
      |      (SELECT CAST(max(ts) AS DATE) FROM events),
      |      INTERVAL 1 DAY)) AS day) s),
      |joined AS (SELECT sp.event_type, sp.day,
      |    coalesce(d.n_events, 0) AS n_events, d.day_value
      |  FROM spine sp LEFT JOIN daily d
      |    ON sp.event_type = d.event_type AND sp.day = d.day)
      |SELECT event_type, CAST(day AS VARCHAR) AS day,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  coalesce(last_value(day_value IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY day
      |    ROWS UNBOUNDED PRECEDING), 0.0) AS locf_value
      |FROM joined ORDER BY event_type, day""".stripMargin

  /** First-order Markov transition matrix over each user's event
    * sequence: lag(event_type) per user in time order → (prev, cur)
    * transition counts and per-prev probabilities. The sequence-mining
    * primitive behind next-action prediction and bot detection. One
    * window shuffle on user_id + one partial-aggregated rollup — the
    * per-user sort is bounded by the busiest single user, not the table.
    */
  def transitionMatrix: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = Tables.events(s, d)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("prev"))
    pairs
      .withColumn("pct",
        Num.roundAt(4)(col("n").cast("double") / sum(col("n")).over(totals)))
      .orderBy(col("prev"), col("cur"))
  }

  val transitionMatrixSql: String =
    s"""WITH seq AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |pairs AS (SELECT prev, event_type AS cur, count(*) AS n
      |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2)
      |SELECT prev, cur, n,
      |  ${Num.roundAtSql(4, "CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev)")} AS pct
      |FROM pairs ORDER BY prev, cur""".stripMargin

  /** Exponentially-weighted moving average of daily purchase value per
    * event type, dyadic-exact: a 7-day half-life-1 decay
    * `ewma_t = Σ_{k=0..6} 2^{-k}·x_{t-k} / Σ 2^{-k}` computed entirely in
    * scaled integers. Daily values are exact micro-unit longs, each lagged
    * term is multiplied by `2^{6-k}` (a long shift — exact), and the single
    * final division by the constant weight total happens once per row, so
    * the result is an exact rational both engines print identically. The
    * usual recursive-EWMA float accumulation drifts with evaluation order
    * and can never hash-match across engines; the bounded dyadic form is
    * the deterministic way to ship a decayed metric.
    *
    * Scale: one day-grain aggregate (map-side combined) then a 6-deep lag
    * window per event type — |types| tiny series, the window costs nothing
    * after the aggregate's shuffle. At 10⁹ keys the same shape holds:
    * partitionBy the series key, the frame stays 7 rows.
    */
  def ewmaDaily: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 1000000).cast("long")).as("micros"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    // Σ_{k=0..6} x_{t-k} · 2^(6-k), missing leading days contribute 0 —
    // the same "as much history as exists" convention both engines share.
    val num = (0 to 6).map(k =>
        coalesce(lag(col("micros"), k).over(w), lit(0L)) * (1L << (6 - k)))
      .reduce(_ + _)
    val den = (0 to 6).map(k => 1L << (6 - k)).sum  // 127
    daily
      .withColumn("ewma",
        (num.cast("double") / den / 1000000.0).as("ewma"))
      .select(col("event_type"), col("day").cast("string").as("day"),
        (col("micros").cast("double") / 1000000.0).as("day_value"),
        Num.roundAt(6)(col("ewma")).as("ewma"))
      .orderBy(col("event_type"), col("day"))
  }

  val ewmaDailySql: String = {
    val num = (0 to 6).map(k =>
      s"coalesce(lag(micros, $k) OVER w, 0) * ${1L << (6 - k)}").mkString(" + ")
    s"""WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(round(value * 1000000) AS BIGINT)) AS micros
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(day AS VARCHAR) AS day,
      |  CAST(micros AS DOUBLE) / 1000000.0 AS day_value,
      |  ${Num.roundAtSql(6, s"CAST($num AS DOUBLE) / 127 / 1000000.0")} AS ewma
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)
      |ORDER BY event_type, day""".stripMargin
  }

  /** Top-10 session paths: gap-sessionize (30-min inactivity, the
    * [[EventOps.sessionize]] rule), render each session's ordered
    * event-type sequence as a `>`-joined path string, and count sessions
    * per path. The per-path census is how product analytics answers "what
    * do users actually do" — and the grain pivot (events → sessions →
    * path strings) exercises ordered collect, which no other gate does.
    *
    * Determinism: the in-session order ties on (ts, event_id) — collected
    * as a sort_array over (ts, event_id, type) structs, so the path string
    * is unique regardless of partition layout. Top-10 ties break on the
    * path string itself.
    *
    * Scale: one shuffle on user_id (sessionize window), one on the session
    * key for the collect, then the path census is a partial-aggregated
    * count on strings with bounded cardinality. Session length bounds the
    * collected array — the 30-min gap rule keeps it human-scale by
    * construction, never corpus-scale.
    */
  def topPaths: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val sessions = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
      .withColumn("session_idx", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .groupBy(col("user_id"), col("session_idx"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(array_join(
        transform(col("evs"), e => e.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(10)
  }

  val topPathsSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_new
      |  FROM lagged),
      |sessions AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM flagged),
      |paths AS (
      |  SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |  FROM sessions GROUP BY user_id, session_idx)
      |SELECT path, count(*) AS n_sessions FROM paths
      |GROUP BY path ORDER BY n_sessions DESC, path ASC LIMIT 10""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_transition_matrix" -> transitionMatrix,
    "q_funnel" -> funnel,
    "q_cohort_retention" -> cohortRetention,
    "q_gap_fill" -> gapFill,
    "q_ewma" -> ewmaDaily,
    "q_top_paths" -> topPaths,
  )

  val oracles: Map[String, String] = Map(
    "q_transition_matrix" -> transitionMatrixSql,
    "q_funnel" -> funnelSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_gap_fill" -> gapFillSql,
    "q_ewma" -> ewmaDailySql,
    "q_top_paths" -> topPathsSql,
  )
}
