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
      .crossJoin(daily.select(col("event_type")).distinct())
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

  val queries: Map[String, Q] = Map(
    "q_transition_matrix" -> transitionMatrix,
    "q_funnel" -> funnel,
    "q_cohort_retention" -> cohortRetention,
    "q_gap_fill" -> gapFill,
  )

  val oracles: Map[String, String] = Map(
    "q_transition_matrix" -> transitionMatrixSql,
    "q_funnel" -> funnelSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_gap_fill" -> gapFillSql,
  )
}
