package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Data-quality operators — the Deequ/Great-Expectations role in a
  * lakehouse: column profiling and declarative constraint checks, both as
  * plain aggregates so they ride the scan and scale like any other rollup.
  * The reference's silver layer IS a cleansing pipeline (date repair,
  * numeric coercion, code decoding); these operators are how such a
  * pipeline measures itself.
  *
  * Scale shapes:
  *  - the profile is ONE pass over the table: every per-column statistic
  *    (nulls, distincts, min/max) is a conditional aggregate in a single
  *    `agg`, then unpivoted to long form — no per-column scans, no
  *    shuffles beyond the one partial-aggregated exchange. Exact distinct
  *    counts use Spark's Expand rewrite (one extra map-side blowup per
  *    distinct column); at 100 TB swap `approx_count_distinct` or the
  *    engine's `graft_kmv` when ±2% is acceptable.
  *  - checks are the same shape: each constraint is a `sum(when(...))`
  *    violation counter; referential integrity is a broadcast anti-join
  *    probe when the parent key set is dimension-sized, a shuffle join
  *    when it is not.
  */
object QualityOps {

  type Q = (SparkSession, String) => DataFrame

  /** One-pass column profile of `orders`: per column — null count, exact
    * distinct count, min/max rendered as strings (the Deequ "analyzer"
    * table). Long-form output via an unpivot of a single wide aggregate
    * row.
    */
  def dataProfile: Q = (s, d) => {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val o = Tables.orders(s, d).select(cols.map(col): _*)
      .transform(graft.core.Spread.bySize(s, d, Seq("orders")))
    // nulls + exact distincts in one pass: all-long agg buffers keep the
    // multi-distinct Expand rewrite in HashAggregate. min/max run as a
    // SEPARATE grouping-free pass because min/max over var-length types
    // (strings here) have immutable buffers, and fusing them into the
    // Expand pass demoted the WHOLE aggregate to SortAggregate — a 7-key
    // sort of 7x the row count that only gets worse with scale (measured
    // r11: 3.4 s -> 0.9 s at sf0.1; the extra pass costs 1/7th of the
    // Expand pass's rows at any SF).
    val cntAggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val mmAggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = o.agg(cntAggs.head, cntAggs.tail: _*)
      .crossJoin(o.agg(mmAggs.head, mmAggs.tail: _*))
    // long form via stack() over the single wide row — a per-column
    // union of selects would re-evaluate the aggregate once per column
    // (6 scans of orders at 100 TB); stack is a generator over the one
    // aggregated row, so the table is scanned exactly once
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_str, max_str)")
      .orderBy(col("column_name"))
  }

  val dataProfileSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map { c =>
      s"""SELECT '$c' AS column_name,
        |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        |  CAST(min($c) AS VARCHAR) AS min_str,
        |  CAST(max($c) AS VARCHAR) AS max_str
        |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** The 100 TB profile: null counts stay exact (a cheap conditional sum)
    * but distinct counts come from the mergeable KMV sketch
    * ([[graft.functions.KmvAgg]], 256 hashes/column) instead of the exact
    * Expand rewrite — the swap [[dataProfile]]'s docs promise at scale,
    * here as its own hash-gated operator (the md5-based sketch is
    * deterministic, so even the approximation is oracle-checked
    * bit-for-bit). ONE aggregation pass; per-column state is k longs.
    *
    * Non-string columns are canonicalized before hashing (bigint as-is,
    * money → integer cents, timestamp → yyyy-MM-dd) because double/
    * timestamp-to-string rendering differs across engines; each map is
    * injective on its domain, so distinct counts are unchanged.
    */
  def dataProfileApprox: Q = (s, d) => {
    import graft.ops.{Hashing, Sketches}
    val K = 256
    val canon: Map[String, org.apache.spark.sql.Column] = Map(
      "o_orderkey" -> col("o_orderkey"),
      "o_custkey" -> col("o_custkey"),
      "o_orderstatus" -> col("o_orderstatus"),
      "o_totalprice" -> Num.cents(col("o_totalprice")),
      "o_orderdate" -> date_format(col("o_orderdate"), "yyyy-MM-dd"),
      "o_orderpriority" -> col("o_orderpriority"))
    val cols = canon.keys.toSeq.sorted
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}__nulls"),
        Sketches.kmv(Hashing.md5Long(canon(c)), K).as(s"${c}__kmv"))
    }
    val wide = Tables.orders(s, d)
      .transform(graft.core.Spread.bySize(s, d, Seq("orders")))
      .agg(aggs.head, aggs.tail: _*)
      .select(lit(1).as("_one") +: cols.flatMap(c => Seq(
        col(s"${c}__nulls"),
        Sketches.kmvEstimate(col(s"${c}__kmv"), K).as(s"${c}__approx"))): _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__approx").mkString(", ")
    wide.selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_approx_distinct)")
      .orderBy(col("column_name"))
  }

  val dataProfileApproxSql: String = {
    import graft.ops.{Hashing, Sketches}
    val K = 256
    val canonSql = Map(
      "o_orderkey" -> "o_orderkey",
      "o_custkey" -> "o_custkey",
      "o_orderstatus" -> "o_orderstatus",
      "o_totalprice" -> "CAST(round(o_totalprice * 100) AS BIGINT)",
      "o_orderdate" -> "strftime(o_orderdate, '%Y-%m-%d')",
      "o_orderpriority" -> "o_orderpriority")
    val blocks = canonSql.keys.toSeq.sorted.map { c =>
      val h = Hashing.md5LongSql(canonSql(c))
      s"""SELECT '$c' AS column_name,
        |  (SELECT CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   FROM orders) AS n_nulls,
        |  (SELECT ${Sketchify.estimate(K)}
        |   FROM (SELECT max(nd) AS nd, max(CASE WHEN rn = $K THEN h END) AS hk
        |     FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn,
        |         count(*) OVER () AS nd
        |       FROM (SELECT DISTINCT $h AS h FROM orders)))) AS n_approx_distinct"""
        .stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** DuckDB estimator fragment shared by the per-column blocks. */
  private object Sketchify {
    def estimate(k: Int): String = graft.ops.Sketches.kmvEstimateSql("nd", "hk", k)
  }

  /** Declarative constraint suite over the star schema, one row per named
    * check with its violation count and verdict:
    *  - `pk_unique`: o_orderkey has no duplicates
    *  - `fk_customer`: every o_custkey exists in customer (referential
    *    integrity, anti-join probe)
    *  - `price_positive`: o_totalprice > 0
    *  - `status_domain`: o_orderstatus within its code set
    *  - `date_bounds`: order dates inside the corpus's known range
    */
  def dqChecks: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val dupKeys = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    val orphans = o.join(broadcast(Tables.customer(s, d).select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    val scalarChecks = o.agg(
      sum(when(col("o_totalprice") <= 0, 1).otherwise(0)).cast("long").as("bad_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
        .cast("long").as("bad_status"),
      sum(when(col("o_orderdate") < "1992-01-01" || col("o_orderdate") > "1998-12-31",
        1).otherwise(0)).cast("long").as("bad_date")).first()
    import s.implicits._
    Seq(
      ("pk_unique", dupKeys),
      ("fk_customer", orphans),
      ("price_positive", scalarChecks.getLong(0)),
      ("status_domain", scalarChecks.getLong(1)),
      ("date_bounds", scalarChecks.getLong(2)))
      .toDF("check_name", "n_violations")
      .withColumn("verdict", when(col("n_violations") === 0, "pass").otherwise("fail"))
      .orderBy(col("check_name"))
  }

  val dqChecksSql: String =
    """WITH checks AS (
      |  SELECT 'pk_unique' AS check_name, (SELECT count(*) FROM (
      |      SELECT o_orderkey FROM orders GROUP BY o_orderkey
      |      HAVING count(*) > 1)) AS n_violations
      |  UNION ALL SELECT 'fk_customer', (SELECT count(*) FROM orders
      |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |  UNION ALL SELECT 'price_positive', (SELECT count(*) FROM orders
      |    WHERE o_totalprice <= 0)
      |  UNION ALL SELECT 'status_domain', (SELECT count(*) FROM orders
      |    WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
      |  UNION ALL SELECT 'date_bounds', (SELECT count(*) FROM orders
      |    WHERE o_orderdate < DATE '1992-01-01' OR o_orderdate > DATE '1998-12-31'))
      |SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
      |  CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS verdict
      |FROM checks ORDER BY check_name""".stripMargin

  /** Robust outlier census per group: median + MAD (median absolute
    * deviation), flagging rows with |x − med| > 3·MAD — the
    * heavy-tail-safe twin of `q_outlier_zscore` (mean/stddev collapse
    * under the very outliers they're meant to find; median/MAD don't).
    *
    * Exactness: prices are DOUBLED integer cents, so the exact median of
    * an even-sized group — the midpoint of two even longs — is itself an
    * integer, deviations are integer, and the MAD's own midpoint lands on
    * an exact .5 at worst. Every comparison both engines make is between
    * exactly-representable values; no interpolation noise survives.
    *
    * Scale: two grouped exact percentiles (each one shuffle-sort per
    * group) + one broadcast of the |groups|-row bounds table back onto
    * the scan for the census. At 100 TB swap the exact percentile for
    * the engine's mergeable quantile sketch (`q_approx_quantiles`
    * pattern) — the shape stays scan + tiny-join + count.
    */
  def madOutliers: Q = (s, d) => {
    // spread the unsplittable single-row-group scan so the percentile
    // partials (the dominant cost: per-partition value collection) run on
    // every core instead of one (guide §2.5; no-op at scale by size test)
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        (Num.cents(col("l_extendedprice")) * 2).as("c2"))
      .transform(graft.core.Spread.bySize(s, d, Seq("lineitem")))
    val med = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(c2, 0.5)").as("med2"))
    val mad = li.join(broadcast(med), "l_returnflag")
      .select(col("l_returnflag"), abs(col("c2") - col("med2")).as("dev2"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(dev2, 0.5)").as("mad2"))
    li.join(broadcast(med), "l_returnflag").join(broadcast(mad), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(abs(col("c2") - col("med2")) > lit(3.0) * col("mad2"), 1L)
          .otherwise(0L)).as("n_outliers"),
        (first(col("med2")) / 200.0).as("median_price"),
        (first(col("mad2")) / 200.0).as("mad_price"))
      .orderBy(col("l_returnflag"))
  }

  val madOutliersSql: String =
    """WITH c AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) * 2 AS c2
      |  FROM lineitem),
      |med AS (SELECT l_returnflag, quantile_cont(c2, 0.5) AS med2
      |  FROM c GROUP BY 1),
      |mad AS (SELECT c.l_returnflag, quantile_cont(abs(c2 - med2), 0.5) AS mad2
      |  FROM c JOIN med USING (l_returnflag) GROUP BY 1)
      |SELECT c.l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN abs(c2 - med2) > 3.0 * mad2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  any_value(med2) / 200.0 AS median_price,
      |  any_value(mad2) / 200.0 AS mad_price
      |FROM c JOIN med USING (l_returnflag) JOIN mad USING (l_returnflag)
      |GROUP BY c.l_returnflag ORDER BY c.l_returnflag""".stripMargin

  /** Winsorized group totals: clamp prices to the group's exact
    * [1/16, 15/16] quantiles before summing — the standard
    * tail-robust aggregate for training-metric stability. The dyadic
    * fractions are deliberate: interpolating integer cents at k/16
    * keeps every intermediate exactly representable (the same reasoning
    * as `q_percentiles`' power-of-two medians), so the clamp bounds are
    * bit-identical across engines where p5/p95 would not be.
    *
    * Scale: one grouped exact percentile pass + one broadcast of the
    * bounds onto the scan; the clamped sum stays in integer cents
    * (order-independent).
    */
  def winsorize: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), Num.cents(col("l_extendedprice")).as("pc"))
      .transform(graft.core.Spread.bySize(s, d, Seq("lineitem")))
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(pc, array(0.0625, 0.9375))").as("bs"))
      .select(col("l_returnflag"),
        element_at(col("bs"), 1).as("lo"), element_at(col("bs"), 2).as("hi"))
    li.join(broadcast(bounds), "l_returnflag")
      .select(col("l_returnflag"), col("lo"), col("hi"),
        greatest(least(col("pc").cast("double"), col("hi")), col("lo")).as("wc"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        // wc is an exact k/16-of-integers value: scale by 16 to an exact
        // long before summing (order-independent), surface as dollars
        (sum((col("wc") * 16).cast("long")).cast("double") / 16.0 / 100.0)
          .as("winsorized_total"),
        (first(col("lo")) / 100.0).as("p_lo"),
        (first(col("hi")) / 100.0).as("p_hi"))
      .orderBy(col("l_returnflag"))
  }

  val winsorizeSql: String =
    """WITH c AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      |  FROM lineitem),
      |b AS (SELECT l_returnflag,
      |    quantile_cont(pc, 0.0625) AS lo, quantile_cont(pc, 0.9375) AS hi
      |  FROM c GROUP BY 1)
      |SELECT c.l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CAST(greatest(least(CAST(pc AS DOUBLE), hi), lo) * 16 AS BIGINT)) AS DOUBLE)
      |    / 16.0 / 100.0 AS winsorized_total,
      |  any_value(lo) / 100.0 AS p_lo,
      |  any_value(hi) / 100.0 AS p_hi
      |FROM c JOIN b USING (l_returnflag)
      |GROUP BY c.l_returnflag ORDER BY c.l_returnflag""".stripMargin

  /** Two-sample Kolmogorov-Smirnov drift test between two order epochs
    * (pre/post 1998) on `o_totalprice` — the numeric companion to
    * [[CorpusOps.distributionDrift]]'s categorical share deltas: "did the
    * price distribution move between snapshots?" is the standard
    * drift-monitoring question for any feature/metric column.
    *
    * Binned-ECDF formulation: prices bucket into fixed $1000-wide bins
    * (integer cents `div`, exact in both engines), per-bin epoch counts
    * aggregate with map-side combine, and the KS statistic
    * `D = max |ECDF_a - ECDF_b|` comes from ONE cumulative window over the
    * aggregated bins — provably bounded input (≤ ~500 bins regardless of
    * row count), never a row-level global sort. The max is located on the
    * integer cross-product `|cum_a·tot_b - cum_b·tot_a|` so the argmax bin
    * is exact (no float epsilon at the tie boundary); the only double is
    * the final presentation ratio. At 100 TB the shape is unchanged: the
    * scan-side bin/flag projection dominates and the window covers the
    * same ≤ 500 rows. (For counts where `tot_a·tot_b` would exceed int64,
    * locate the max on the double ECDF delta and keep the integer form per
    * partition — the bin grid makes either formulation deterministic.)
    */
  def ksDrift: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val perBin = Tables.orders(s, d)
      .select(
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100000").as("bin"),
        when(col("o_orderdate") < to_timestamp(lit("1998-01-01")), 1L)
          .otherwise(0L).as("in_a"))
      .groupBy(col("bin"))
      .agg(sum(col("in_a")).as("a"),
        (count(lit(1)) - sum(col("in_a"))).as("b"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perBin.select(col("bin"),
      sum(col("a")).over(w).as("ca"), sum(col("b")).over(w).as("cb"))
    val tot = perBin.agg(sum(col("a")).as("tot_a"), sum(col("b")).as("tot_b"))
    cum.crossJoin(broadcast(tot))
      .withColumn("ks_num",
        abs(col("ca") * col("tot_b") - col("cb") * col("tot_a")))
      .orderBy(col("ks_num").desc, col("bin").asc).limit(1)
      .select(col("tot_a"), col("tot_b"), col("ks_num"),
        Num.roundAt(6)(col("ks_num").cast("double")
          / (col("tot_a").cast("double") * col("tot_b").cast("double")))
          .as("ks_stat"),
        col("bin").as("at_bin"))
  }

  val ksDriftSql: String =
    s"""WITH b AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS bin,
      |    CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS in_a
      |  FROM orders),
      |c AS (SELECT bin, CAST(sum(in_a) AS BIGINT) AS a,
      |    CAST(count(*) - sum(in_a) AS BIGINT) AS bb
      |  FROM b GROUP BY 1),
      |cum AS (SELECT bin, CAST(sum(a) OVER (ORDER BY bin) AS BIGINT) AS ca,
      |    CAST(sum(bb) OVER (ORDER BY bin) AS BIGINT) AS cb FROM c),
      |t AS (SELECT CAST(sum(a) AS BIGINT) AS tot_a,
      |    CAST(sum(bb) AS BIGINT) AS tot_b FROM c)
      |SELECT tot_a, tot_b, CAST(abs(ca*tot_b - cb*tot_a) AS BIGINT) AS ks_num,
      |  ${Num.roundAtSql(6, "CAST(abs(ca*tot_b - cb*tot_a) AS DOUBLE) / (CAST(tot_a AS DOUBLE) * CAST(tot_b AS DOUBLE))")} AS ks_stat,
      |  bin AS at_bin
      |FROM cum, t
      |ORDER BY abs(ca*tot_b - cb*tot_a) DESC, bin ASC LIMIT 1""".stripMargin

  /** In-flight metrics via the `Observation` API (`Dataset.observe`):
    * quality counters collected DURING a real pass — here a filtered
    * projection that would feed a downstream sink — with zero extra
    * scans. The observed aggregates (row count, null count, integer-cents
    * sum, min/max) ride the task metrics channel, not a second job; the
    * gate materializes them as a one-row DataFrame that must hash-match
    * the oracle computing the same statistics the ordinary way. This is
    * the Deequ-runtime-metrics / "write + audit in one pass" shape: at
    * 100 TB a separate audit scan doubles the job, an observation is
    * free.
    */
  def observeMetrics: Q = (s, d) => {
    val obs = new org.apache.spark.sql.Observation()
    val pass = Tables.orders(s, d)
      .filter(col("o_orderstatus") =!= "P")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("n_urgent"),
        sum(Num.cents(col("o_totalprice"))).as("sum_cents"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
    // the real work the metrics ride on (dir salted per data dir so
    // concurrent SF runs don't collide)
    pass.write.mode("overwrite").parquet(Scratch.dir(
      s"observe_pass_sink_${java.lang.Integer.toHexString(d.hashCode)}"))
    val m = obs.get
    import scala.jdk.CollectionConverters._
    s.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        m("n_rows").asInstanceOf[Long], m("n_urgent").asInstanceOf[Long],
        m("sum_cents").asInstanceOf[Long], m("min_key").asInstanceOf[Long],
        m("max_key").asInstanceOf[Long])),
      org.apache.spark.sql.types.StructType(
        Seq("n_rows", "n_urgent", "sum_cents", "min_key", "max_key")
          .map(n => org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.LongType))))
  }

  val observeMetricsSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders WHERE o_orderstatus <> 'P'""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_observe_metrics" -> observeMetrics,
    "q_data_profile" -> dataProfile,
    "q_data_profile_approx" -> dataProfileApprox,
    "q_dq_checks" -> dqChecks,
    "q_mad_outliers" -> madOutliers,
    "q_winsorize" -> winsorize,
    "q_ks_drift" -> ksDrift,
  )

  val oracles: Map[String, String] = Map(
    "q_observe_metrics" -> observeMetricsSql,
    "q_ks_drift" -> ksDriftSql,
    "q_data_profile" -> dataProfileSql,
    "q_data_profile_approx" -> dataProfileApproxSql,
    "q_dq_checks" -> dqChecksSql,
    "q_mad_outliers" -> madOutliersSql,
    "q_winsorize" -> winsorizeSql,
  )
}
