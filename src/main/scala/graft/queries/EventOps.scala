package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Event-time analytics over the `events` table: tumbling-window rollups,
  * gap-based sessionization, and the SQL/temp-view surface (SURVEY §2.1 S9
  * — the reference exposes DataFrames to `spark.sql` via
  * `createOrReplaceTempView`, scd_type2.py:155-156).
  *
  * These are the batch twins of graft.streaming (same window semantics);
  * value sums are scaled to integer micros so they are order-independent
  * and hash-stable (see Num).
  */
object EventOps {

  type Q = (SparkSession, String) => DataFrame

  private def microSum(c: org.apache.spark.sql.Column) = Num.microSum(c)
  private val microSumSql = (e: String) => Num.microSumSql(e)

  /** Per-data-dir sink name: the memory-sink temp view and its derived
    * checkpoint dir are global JVM/machine state, so a fixed name would
    * collide across concurrent or interleaved invocations at different
    * scale factors (parallel test runners, back-to-back verify runs).
    * Salting with the data dir makes every stream gate reentrant per SF.
    */
  private def sinkFor(base: String, dataDir: String): String =
    base + "_" + java.lang.Integer.toHexString(dataDir.hashCode)

  /** Streaming STATE partition sizing. A stateful streaming query's state
    * store instance count is pinned to `spark.sql.shuffle.partitions` at
    * first query start (recorded in the checkpoint, immutable for the
    * stream's lifetime) — so it is a PER-STREAM capacity decision, not the
    * session-wide batch-shuffle default. Every micro-batch pays a fixed
    * per-store cost (snapshot + delta file per partition per batch)
    * regardless of data volume, so oversizing multiplies pure overhead:
    * the stream-stream join gate at 32 state partitions spends 20s+ on
    * ~100k rows, 4x the 8-partition time, all of it store maintenance.
    * Production sizes this to peak keys/batch per store; the gates pin a
    * small count (micro-batches here are file-sized). The batch default is
    * restored after query start — state geometry and batch shuffle
    * geometry are independent knobs.
    */
  private[graft] def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  /** State partitions for the streaming gates (micro-batches are single
    * file splits; see [[withStatePartitions]]). */
  private[graft] val StatePartitions = 8

  /** Tumbling 1-hour windows per event type (batch `window()` — identical
    * semantics to the streaming groupBy(window(...)) path).
    */
  def tumblingWindow: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        microSum(col("value")).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("n_users"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val tumblingWindowSql: String =
    s"""SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS VARCHAR) AS window_start,
      |  event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |  ${microSumSql("value")} AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** SLIDING (overlapping) 1-hour windows advancing every 30 minutes: each
    * event lands in exactly 2 windows (duration/slide), the generator-based
    * twin of [[tumblingWindow]]. Same streaming-compatible semantics as
    * `groupBy(window(ts, dur, slide))` in a `readStream` plan.
    *
    * SCALE: `window()` with a slide is a generator (duration/slide rows per
    * event) fused into the scan projection BEFORE the aggregation shuffle —
    * the map-side partial agg sees the exploded stream, so shuffle volume is
    * |windows × types|, not |events × 2|. The overlap factor is the knob:
    * cost scales linearly with duration/slide.
    */
  def slidingWindow: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), microSum(col("value")).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Oracle: an event at t belongs to the 1h/30min sliding windows starting
    * at time_bucket(30min, t) and 30 minutes earlier — enumerated as a
    * 2-way UNION ALL (DuckDB has no sliding window-assign generator).
    */
  val slidingWindowSql: String =
    s"""WITH assigned AS (
      |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, event_type, value FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type, value
      |  FROM events)
      |SELECT CAST(ws AS VARCHAR) AS window_start, event_type,
      |  count(*) AS n_events, ${microSumSql("value")} AS sum_value
      |FROM assigned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The STREAMING twin of [[tumblingWindow]], hash-gated against the same
    * kind of batch oracle — the promote-batch-to-incremental guarantee
    * made checkable: the events file is consumed through a real
    * Structured Streaming file source (micro-batches, watermark, state
    * store) into a memory sink, and the final result must hash-match the
    * DuckDB batch aggregation. Complete output mode so every window
    * surfaces (append would hold back windows the watermark hasn't
    * closed); exact `countDistinct` is unsupported in streaming aggs, so
    * the gated columns are count + integer-micro sum (order-independent,
    * hence identical across micro-batch boundaries — a double sum would
    * depend on file-split arrival order).
    *
    * SCALE: the state store keys on (window, event_type) — bounded by the
    * watermark horizon; `maxFilesPerTrigger` bounds per-batch work. Same
    * one-shuffle geometry as the batch plan, amortized over arrivals.
    */
  def streamWindow: Q = (s, d) =>
    streamWindowOver(s, d, glob = "events.parquet",
      sink = sinkFor("graft_stream_window_sink", d))

  /** The streaming pipeline itself, parameterized over source dir/glob so
    * specs can feed a MULTI-FILE copy (several micro-batches) and assert
    * the state-store merge reproduces the single-batch result —
    * `maxFilesPerTrigger=1` forces one micro-batch per file there.
    */
  private[graft] def streamWindowOver(s: SparkSession, dir: String,
                                        glob: String, sink: String): DataFrame = {
    val stream = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), microSum(col("value")).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
    }
    s.table(sink).orderBy(col("window_start"), col("event_type"))
  }

  val streamWindowSql: String =
    s"""SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS VARCHAR) AS window_start,
      |  event_type, count(*) AS n_events,
      |  ${microSumSql("value")} AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private[graft] val eventSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** One run of the restart pipeline: file-source stream over `glob` under
    * `srcDir`, windowed agg, complete-mode memory sink, STOPPED when the
    * currently visible files are consumed. Both phases of
    * [[streamRestart]] call this with the SAME checkpoint — the second
    * call is a cold restart that must recover offsets + agg state.
    */
  private[graft] def restartRun(s: SparkSession, srcDir: String, glob: String,
                                sink: String, ckpt: String): Unit = {
    val stream = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), microSum(col("value")).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    withStatePartitions(s, StatePartitions) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
    }
  }

  /** Deterministic 4-file copy of events (hash-split on event_id) under
    * scratch, built once per data dir (`_SUCCESS` marks a completed
    * layout) — the multi-micro-batch fixture shared by the restart and
    * stream-stream-join gates.
    */
  private[graft] def eventFilesDir(s: SparkSession, d: String): String = {
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val srcDir = Scratch.dir(s"stream_restart_src_$tag")
    if (!new java.io.File(srcDir, "_SUCCESS").exists) {
      Scratch.wipe(srcDir)
      s.read.schema(eventSchema)
        .parquet(d + "/events.parquet")
        .repartition(4, col("event_id"))
        .write.mode("overwrite").parquet(srcDir)
    }
    srcDir
  }

  /** STREAM-STREAM inner join, hash-gated: last-touch click attribution —
    * every (purchase, click) pair for the same user with the click in the
    * 30 minutes up to the purchase. Two independent file-source streams
    * over the same 4-file events layout (1 file per micro-batch, hash-
    * split, so a purchase routinely arrives batches before or after its
    * matching click); Spark buffers BOTH sides in the join state store and
    * emits each match in the micro-batch that completes it. The append-
    * mode memory sink must hash-match the batch self-join oracle — pairs
    * can only go missing if cross-batch join state was dropped, and only
    * duplicate if a side was replayed.
    *
    * Watermarks are set far beyond the dataset's span, so no state is
    * evicted mid-gate and stream ≡ batch EXACTLY regardless of file
    * arrival order; production narrows the delay to the real lateness
    * bound and the SAME plan ages click state out 30 minutes behind the
    * purchase watermark (the range condition gives Spark the state TTL —
    * the at-scale contract that keeps a 100 TB/day join's state bounded).
    */
  def streamJoin: Q = (s, d) => {
    val srcDir = eventFilesDir(s, d)
    def src: DataFrame = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", "part-*")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "90 days")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "90 days")
    val joined = purchases.join(clicks,
        col("click_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000")
          .as("lag_sec"))
    val sink = sinkFor("graft_stream_join_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = joined.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    s.table(sink).orderBy(col("purchase_id"), col("click_id"))
  }

  val streamJoinSql: String =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |  p.user_id AS user_id,
      |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_sec
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      |  AND p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  /** Stream-stream LEFT OUTER join, hash-gated — the semantic the inner
    * join gate can't exercise: a purchase with NO qualifying click must
    * still come out, null-extended, and that row can only be emitted once
    * the watermark PROVES no matching click can ever arrive (the engine
    * holds the unmatched row in state until the join-condition horizon
    * expires). The fixture reuses [[sessionFilesDir]]'s flush sentinels:
    * `withWatermark` sits BEFORE the event-type filter so the sentinel
    * rows advance both sides' watermarks past every real horizon, and the
    * second sentinel triggers the batch in which the null-extensions
    * actually flush. The append-mode sink must hash-match the batch LEFT
    * JOIN oracle exactly: a lost state row drops a null-extension, a
    * premature expiry null-extends a purchase that HAD a match (two rows
    * where the oracle has one).
    *
    * SCALE: same bounded-state contract as the inner join — both sides'
    * buffers expire at watermark + interval; the outer side additionally
    * emits its expiring rows instead of just dropping them.
    */
  def streamOuterJoin: Q = (s, d) => {
    val srcDir = sessionFilesDir(s, d)
    def src: DataFrame = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", "part-*")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val clicks = src.withWatermark("ts", "40 days")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    val purchases = src.withWatermark("ts", "40 days")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val joined = purchases.join(clicks,
        col("click_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("purchase_ts"),
        "leftOuter")
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000")
          .as("lag_sec"))
    val sink = sinkFor("graft_stream_outer_join_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = joined.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    // sentinel purchases (negative users) surface as null-extended rows —
    // excluded by user, the only column the sentinels are allowed to mark
    s.table(sink).filter(col("user_id") >= 0)
      .orderBy(col("purchase_id"), col("click_id"))
  }

  val streamOuterJoinSql: String =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |  p.user_id AS user_id,
      |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_sec
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  /** RESTART RECOVERY, hash-gated: the events table is split into 4 files;
    * run 1 ingests only the first two (then the query is STOPPED — a
    * mid-stream shutdown with durable checkpoint state: offsets in the
    * file-source log, partial window aggregates in the state store); run 2
    * is a brand-new query on the SAME checkpoint that sees all 4 files,
    * recovers, and processes only the unseen two. The final memory-sink
    * table must hash-match the batch single-read oracle — if recovery
    * re-read a committed file (double count) or dropped state (undercount),
    * the counts and integer-micro sums both move. The restarted sink
    * starts empty, so the final table is correct ONLY if complete mode
    * re-emits recovered state — sink contents before the kill don't help.
    *
    * SCALE: this is the operational contract of any long-running 100 TB
    * ingest — executors die, queries redeploy; correctness rests on the
    * checkpoint (offsets + state store), never on sink history.
    */
  def streamRestart: Q = (s, d) => {
    val srcDir = eventFilesDir(s, d)
    val sink = sinkFor("graft_stream_restart_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    restartRun(s, srcDir, "part-0000[01]*", sink, ckpt) // partial ingest, stop
    restartRun(s, srcDir, "part-*", sink, ckpt)         // cold restart, resume
    s.table(sink).orderBy(col("window_start"), col("event_type"))
  }

  /** Session windows through a REAL stream, hash-gated: Spark's
    * `session_window` (dynamic gap-merge in the state store) consumed
    * from the events file source in complete mode must reproduce the
    * batch lag/flag/cumsum sessionization. Boundary semantics matter and
    * are pinned by the gate: an event at EXACTLY the 30-min gap still
    * merges into the session (`session_window` extends while
    * `diff <= gap`; verified at sf0.1, where one exact-1800s gap makes a
    * `>=` oracle split one session too many), so the oracle's
    * new-session flag is `diff > 1800` — the same boundary as the batch
    * [[sessionize]] query.
    *
    * SCALE: session-window state merges per user key and is bounded by
    * the watermark horizon in production append mode; the session count +
    * per-session event counts shuffle once on the user key, exactly like
    * the batch window formulation.
    */
  def streamSessions: Q = (s, d) => {
    val stream = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    val agg = stream
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"))
    val sink = sinkFor("graft_stream_sessions_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
    }
    s.table(sink).orderBy(col("user_id"), col("session_start"))
  }

  val streamSessionsSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_new
      |  FROM lagged),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM flagged)
      |SELECT user_id,
      |  strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  count(*) AS n_events
      |FROM sessions GROUP BY user_id, session_idx
      |ORDER BY user_id, session_start""".stripMargin

  /** At-least-once delivery repaired to exactly-once by STREAMING DEDUP,
    * hash-gated: the events file is delivered TWICE (two file sources
    * unioned — the duplicate-delivery failure mode of any at-least-once
    * bus), `dropDuplicates(event_id)` collapses redelivery in the state
    * store, and the per-type rollup of the sink must hash-match the
    * batch single-read oracle. If the dedup state dropped or double-kept
    * a single event, the counts and the integer-micro value sum would
    * both move.
    *
    * SCALE: dedup state is one key per event id — in production bounded
    * with `withWatermark` + the event-time column in the key (see
    * `Streaming.dedupStream`); unbounded here because the gate replays a
    * finite file. State-store shuffle on the dedup key, then the rollup
    * geometry of every other event query.
    */
  def streamDedup: Q = (s, d) => {
    def src = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    val deduped = src.unionByName(src).dropDuplicates("event_id")
      .select(col("event_id"), col("event_type"), col("value"))
    val sink = sinkFor("graft_stream_dedup_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = deduped.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    s.table(sink)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), microSum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val streamDedupSql: String =
    s"""SELECT event_type, count(*) AS n_events,
      |  ${microSumSql("value")} AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Gap-based sessionization (30-minute inactivity): lag → new-session
    * flag → running sum as session index — the batch formulation of
    * streaming session windows.
    */
  def sessionize: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
      .withColumn("session_idx", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        // explicit micros format: plain casts print differing sub-second
        // precision across engines (Spark micros vs DuckDB nanos)
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val sessionizeSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_new
      |  FROM lagged),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM flagged)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
      |  strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS session_end
      |FROM sessions GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** S9: temp-view registration + the `spark.sql` query surface. */
  def sqlTempView: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
        |FROM lineitem_v
        |WHERE l_quantity BETWEEN 10 AND 40
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  val sqlTempViewSql: String =
    """SELECT l_returnflag, count(*) AS n_lines,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
      |FROM lineitem WHERE l_quantity BETWEEN 10 AND 40
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** STREAM-STATIC enrichment join, hash-gated: the streaming events file
    * source joined against a STATIC batch dimension (customer market
    * segment, keyed by user_id = c_custkey) inside the micro-batch plan,
    * then rolled up per segment. The canonical streaming-enrichment
    * pattern: Spark re-plans the static side per micro-batch, no state
    * store involvement for the join itself (unlike [[streamJoin]], which
    * buffers both sides).
    *
    * SCALE: the dimension is customer-sized — broadcast into every
    * micro-batch, so the streaming side never shuffles for the join; the
    * only stateful operator is the segment rollup (|segments| rows of
    * state). Gated columns are count + integer-micro sum (batch-boundary
    * invariant).
    */
  def streamStaticJoin: Q = (s, d) => {
    val dim = graft.core.Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(d)
    val agg = stream
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"), microSum(col("value")).as("sum_value"))
    val sink = sinkFor("graft_stream_static_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
    }
    s.table(sink).orderBy(col("segment"))
  }

  val streamStaticJoinSql: String =
    s"""SELECT c_mktsegment AS segment, count(*) AS n_events,
      |  ${microSumSql("value")} AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Typed rows/state for the custom-SESSION gate ([[streamSessionsCustom]]).
    * `ts` rides along only to carry the watermark metadata into the
    * stateful operator; the session math uses the exact epoch micros.
    */
  final case class SEvent(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  /** One open/closed session interval: [s_us, e_us] epoch micros, n events. */
  final case class SIv(s_us: Long, e_us: Long, n: Long)
  final case class SState(ivs: Seq[SIv])
  final case class SOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Merge session intervals under the gap rule. The gap compares
    * SECOND-floored endpoints (`us div 1e6`), matching the batch oracle's
    * `date_diff('second', …) > 1800` exactly — the chain rule over sorted
    * events is equivalent to interval merging because a cut happens iff
    * one consecutive gap exceeds the threshold.
    */
  private[graft] def mergeSessions(ivs: Seq[SIv], gapSec: Long): Seq[SIv] =
    ivs.sortBy(iv => (iv.s_us, iv.e_us))
      .foldLeft(List.empty[SIv]) { (acc, iv) =>
        acc match {
          case h :: t if iv.s_us / 1000000L - h.e_us / 1000000L <= gapSec =>
            SIv(h.s_us, math.max(h.e_us, iv.e_us), h.n + iv.n) :: t
          case _ => iv :: acc
        }
      }.reverse

  /** 4-file hash-split events + FOUR future "flush sentinel" files (fake
    * users −1..−4, event times far past the real span). Modification
    * times force the source order data → sentinels in sequence. Two
    * engine behaviors shape the construction:
    *
    *  1. Watermark LAG — an update only takes effect one batch after the
    *     data that produced it (see [[streamLateData]]), so the LAST
    *     sentinels guarantee data batches that actually run under the
    *     advanced watermark, firing timeout callbacks / state expiries
    *     without relying on the engine scheduling an extra empty batch.
    *  2. PUSHDOWN vs the watermark — consumers that filter on
    *     `event_type` BEFORE their stateful operator get that predicate
    *     pushed into the parquet scan, and a single-row sentinel file
    *     whose type matches nothing is eliminated by ROW-GROUP STATISTICS
    *     (min = max = the type) before the watermark node ever sees its
    *     event time: the watermark silently stalls. Sentinels therefore
    *     alternate the REAL types 'click' / 'purchase' so each filtered
    *     branch's scan keeps its own sentinel stream; consumers exclude
    *     them by `user_id >= 0`, never by type.
    */
  private[graft] def sessionFilesDir(s: SparkSession, d: String): String = {
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val dir = Scratch.dir(s"stream_sess_src_$tag")
    val ready = new java.io.File(dir, "_READY_V3")
    if (!ready.exists) {
      Scratch.wipe(dir)
      s.read.schema(eventSchema).parquet(d + "/events.parquet")
        .repartition(4, col("event_id"))
        .write.mode("overwrite").parquet(dir)
      val maxUs = s.read.parquet(dir)
        .agg(max(unix_micros(col("ts")))).head.getLong(0)
      val day = 86400L * 1000000L
      def sentinel(uid: Long, tsUs: Long, typ: String, name: String): Unit = {
        val tmp = Scratch.dir(s"stream_sess_sent_${tag}_$name")
        Scratch.wipe(tmp)
        s.range(1).select(lit(uid).as("event_id"),
            timestamp_micros(lit(tsUs)).as("ts"), lit(uid).as("user_id"),
            lit(typ).as("event_type"), lit(0.0).as("value"),
            lit("{}").as("props"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles
          .find(_.getName.startsWith("part-")).get
        java.nio.file.Files.move(part.toPath,
          new java.io.File(dir, s"part-$name.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      (1 to 4).foreach(i =>
        sentinel(-i.toLong, maxUs + (40 + i) * day,
          if (i % 2 == 1) "click" else "purchase", s"zzsent$i"))
      val base = System.currentTimeMillis()
      new java.io.File(dir).listFiles.filter(_.getName.startsWith("part-"))
        .foreach { f =>
          val t = "zzsent([0-9])".r.findFirstMatchIn(f.getName)
            .map(m => base + m.group(1).toLong * 60000L).getOrElse(base)
          f.setLastModified(t)
        }
      ready.createNewFile()
    }
    dir
  }

  /** CUSTOM-STATE SESSIONIZATION via `flatMapGroupsWithState` +
    * `EventTimeTimeout`, hash-gated — the arbitrary-state twin of
    * [[streamSessions]] (which uses the built-in `session_window`): the
    * USER CODE owns the interval-merge (out-of-order events across
    * micro-batches land in the right session), sessions are emitted
    * exactly once when the watermark proves no future event can extend
    * them (wm past end + gap — late rows are filtered before the
    * operator, so the proof is airtight), and idle users flush through
    * timeout callbacks, not data arrival. Append-mode memory sink; the
    * final table must hash-match the batch gaps-and-islands oracle.
    *
    * SCALE: state is the per-user OPEN interval set (bounded by the gap
    * rule — merged intervals collapse to one row each), sharded by the
    * groupByKey shuffle; the watermark bounds state lifetime exactly as
    * in production session stores. The 40-day watermark delay is the
    * fixture's "accept everything" setting; production would use the
    * real lateness SLA and the same code drops the stragglers.
    */
  def streamSessionsCustom: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val srcDir = sessionFilesDir(s, d)
    val gapSec = 1800L
    val typed = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", "part-*")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .withWatermark("ts", "40 days")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[SEvent]
    val out = typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SState, SOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SEvent], state: GroupState[SState]) =>
          val prev = state.getOption.map(_.ivs).getOrElse(Seq.empty)
          val merged = mergeSessions(
            prev ++ batch.map(e => SIv(e.ts_us, e.ts_us, 1L)), gapSec)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // closable: no on-time event can extend (its ts would be < wm)
          val (ready, open) = merged.partition(iv =>
            wmUs > (iv.e_us / 1000000L + gapSec + 1) * 1000000L)
          if (open.isEmpty) state.remove()
          else {
            state.update(SState(open))
            state.setTimeoutTimestamp(
              open.map(iv => (iv.e_us / 1000000L + gapSec + 1) * 1000L + 1).min)
          }
          ready.iterator.map(iv => SOut(uid, iv.s_us, iv.e_us, iv.n))
      }
    val sink = sinkFor("graft_stream_sess_custom_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = out.toDF().writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    s.table(sink).filter(col("user_id") >= 0)
      .select(col("user_id"),
        date_format(timestamp_micros(col("start_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(timestamp_micros(col("end_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  val streamSessionsCustomSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_new
      |  FROM lagged),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM flagged)
      |SELECT user_id,
      |  strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      |  count(*) AS n_events
      |FROM sessions GROUP BY user_id, session_idx
      |ORDER BY user_id, session_start""".stripMargin

  /** 4-file split of events by `event_id % 4` (an assignment the SQL
    * oracle can reproduce — unlike a hash repartition), modification
    * times forcing source order 0→3. Built once per data dir.
    */
  private[graft] def lateFilesDir(s: SparkSession, d: String): String = {
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val dir = Scratch.dir(s"stream_late_src_$tag")
    val ready = new java.io.File(dir, "_READY")
    if (!ready.exists) {
      Scratch.wipe(dir)
      new java.io.File(dir).mkdirs()
      val ev = s.read.schema(eventSchema).parquet(d + "/events.parquet")
      val base = System.currentTimeMillis()
      (0 until 4).foreach { i =>
        val tmp = Scratch.dir(s"stream_late_tmp_${tag}_$i")
        Scratch.wipe(tmp)
        ev.filter(pmod(col("event_id"), lit(4)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles
          .find(_.getName.startsWith("part-")).get
        val dest = new java.io.File(dir, s"part-$i.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dest.setLastModified(base + i * 60000L)
      }
      ready.createNewFile()
    }
    dir
  }

  /** LATE-DATA DROP SEMANTICS, hash-gated: the one watermark behavior the
    * other streaming gates deliberately avoid (their delays accept
    * everything). Here the delay is 2 days against a 30-day event span,
    * files arrive in a deterministic order, and every file after the
    * first carries rows that are LATE relative to the watermark the
    * previous files established — Spark must drop exactly the rows whose
    * 1-day window closed (window end ≤ watermark at batch start), no
    * more, no fewer. The oracle REPLAYS the watermark protocol in SQL:
    * per-file running max event time, floored to millis (Spark tracks
    * event time in ms), minus the delay — a row survives iff its window
    * end exceeds the watermark its batch began with. Update-mode memory
    * sink; a window's final count is its last update (counts only grow).
    *
    * SCALE: this is the state-bound contract at 100 TB/day — the
    * watermark is what keeps the window state store O(horizon) instead
    * of O(history), and this gate pins the exact drop boundary that
    * bound is bought with.
    *
    * Watermark LAG: the watermark applied while processing batch k is
    * derived from event-time stats through batch k−2, not k−1 — the
    * engine computes the new watermark when PLANNING the next batch from
    * the previous batch's recorded stats, so an update takes effect one
    * batch after the data that produced it (verified empirically here:
    * the k−1 model over-drops). The oracle's running max therefore lags
    * TWO files behind.
    */
  def streamLateData: Q = (s, d) => {
    val srcDir = lateFilesDir(s, d)
    val stream = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", "part-*")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val agg = stream.withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("string").as("window_start"), col("n_events"))
    val sink = sinkFor("graft_stream_late_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      q.processAllAvailable()
      q.stop()
    }
    s.table(sink).groupBy(col("window_start"))
      .agg(max(col("n_events")).as("n_events"))
      .orderBy(col("window_start"))
  }

  val streamLateDataSql: String =
    """WITH f AS (SELECT ts, event_id % 4 AS fno FROM events),
      |fm AS (SELECT fno, max(epoch_us(ts)) AS mx FROM f GROUP BY 1),
      |wm AS (SELECT fno,
      |    ((max(mx) OVER (ORDER BY fno ROWS BETWEEN UNBOUNDED PRECEDING
      |        AND 2 PRECEDING)) // 1000 - 172800000) * 1000 AS wm_us
      |  FROM fm),
      |kept AS (SELECT ts FROM f JOIN wm USING (fno)
      |  WHERE wm_us IS NULL
      |     OR epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY) > wm_us)
      |SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS window_start,
      |  count(*) AS n_events
      |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin

  /** Typed event row for the custom-state gate: micro-units and epoch
    * micros are computed COLUMN-side (the same expressions the batch
    * oracle uses), so the typed fold only does exact integer arithmetic.
    */
  final case class UEvent(event_id: Long, user_id: Long, vmicro: Long, ts_us: Long)

  /** Per-user running state carried across micro-batches. */
  final case class UState(user_id: Long, n_events: Long, total_micro: Long,
                          last_us: Long)

  /** CUSTOM KEYED STATE via `mapGroupsWithState`, hash-gated: running
    * per-user totals accumulated across micro-batches (4-file fixture,
    * one file per micro-batch, so almost every user's state is built
    * incrementally over several invocations). Update-mode memory sink
    * keeps every emitted state row; the gate extracts each user's FINAL
    * state (`max(struct(n_events, …))` — `n_events` strictly increases
    * per update) and it must hash-match the batch per-user aggregate.
    * Undercount if state was dropped between batches, overcount if a
    * batch replayed — the same exactly-once contract as the windowed
    * gates, but through the arbitrary-state API where Spark manages only
    * the state STORE and the merge logic is user code.
    *
    * SCALE: state is one row per user key, sharded across state-store
    * partitions by the groupByKey shuffle; production bounds idle keys
    * with a GroupStateTimeout. The fold is exact integer arithmetic, so
    * results are batch-boundary- and arrival-order-invariant.
    */
  def streamUserState: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val srcDir = eventFilesDir(s, d)
    val typed = s.readStream.schema(eventSchema)
      .option("pathGlobFilter", "part-*")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .select(col("event_id"), col("user_id"),
        round(col("value") * 1000000).cast("long").as("vmicro"),
        unix_micros(col("ts")).as("ts_us"))
      .as[UEvent]
    val updates = typed.groupByKey(_.user_id)
      .mapGroupsWithState[UState, UState](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UEvent], state: org.apache.spark.sql.streaming.GroupState[UState]) =>
          val prev = state.getOption.getOrElse(UState(uid, 0L, 0L, Long.MinValue))
          val upd = batch.foldLeft(prev) { (acc, e) =>
            UState(uid, acc.n_events + 1, acc.total_micro + e.vmicro,
              math.max(acc.last_us, e.ts_us))
          }
          state.update(upd)
          upd
      }
    val sink = sinkFor("graft_stream_user_state_sink", d)
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(ckpt)
    s.catalog.dropTempView(sink)
    withStatePartitions(s, StatePartitions) {
      val q = updates.toDF().writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      q.processAllAvailable()
      q.stop()
    }
    s.table(sink)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("total_micro"), col("last_us"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.total_micro").as("total_micro"), col("m.last_us").as("last_us"))
      .orderBy(col("user_id"))
  }

  val streamUserStateSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS total_micro,
      |  max(epoch_us(ts)) AS last_us
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** SCHEDULED INCREMENTAL ETL: `Trigger.AvailableNow` + the built-in
    * exactly-once parquet FILE SINK, hash-gated. Two "scheduled job"
    * invocations share one checkpoint: run 1 sees only the first two
    * files of the 4-file fixture, drains them (AvailableNow processes all
    * currently-available input — still in rate-limited micro-batches —
    * then STOPS the query), run 2 sees all four and must process exactly
    * the unseen two. The file sink records committed files in its
    * `_spark_metadata` log; the batch read-back lists files through that
    * log, so orphan files from an uncommitted batch are invisible. The
    * result must hash-match a single batch read of the source — rows go
    * missing only if the offset log skipped a file, and duplicate only if
    * a drained file was re-processed or a sink commit double-published.
    *
    * This is the most common production shape of Structured Streaming —
    * a cron-scheduled stateless ingest that catches up and exits (no
    * always-on cluster) — and the one streaming sink family the other
    * gates don't cover (memory sink there; TableLog's custom foreachBatch
    * protocol in q_table_log_stream).
    *
    * SCALE: stateless projection/filter — no state store at all; the
    * offset log bounds re-scan to file listing, `maxFilesPerTrigger`
    * bounds batch size, and each run's work is proportional to NEW data
    * only — the incremental contract that replaces daily full re-reads at
    * 100 TB.
    */
  def streamAvailableNow: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = eventFilesDir(s, d)
    val sink = sinkFor("graft_stream_avnow", d)
    val outDir = Scratch.dir(s"stream_out_$sink")
    val ckpt = Scratch.dir(s"stream_ckpt_$sink")
    Scratch.wipe(outDir)
    Scratch.wipe(ckpt)
    def run(glob: String): Unit = {
      val etl = s.readStream.schema(eventSchema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .filter(col("event_type").isin("click", "purchase", "view"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value") * 1000000).cast("long").as("value_micro"),
          unix_micros(col("ts")).as("ts_us"))
      val q = etl.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run("part-0000[01]*") // scheduled run 1: partial input, drain, exit
    run("part-*")         // scheduled run 2: catch up on the rest
    s.read.parquet(outDir).orderBy(col("event_id"))
  }

  val streamAvailableNowSql: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(round(value * 1000000) AS BIGINT) AS value_micro,
      |  epoch_us(ts) AS ts_us
      |FROM events WHERE event_type IN ('click', 'purchase', 'view')
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_tumbling_window" -> tumblingWindow,
    "q_sliding_window" -> slidingWindow,
    "q_stream_window" -> streamWindow,
    "q_stream_sessions" -> streamSessions,
    "q_stream_sessions_custom" -> streamSessionsCustom,
    "q_stream_late_data" -> streamLateData,
    "q_stream_dedup" -> streamDedup,
    "q_stream_restart" -> streamRestart,
    "q_stream_join" -> streamJoin,
    "q_stream_outer_join" -> streamOuterJoin,
    "q_stream_static_join" -> streamStaticJoin,
    "q_stream_user_state" -> streamUserState,
    "q_stream_available_now" -> streamAvailableNow,
    "q_sessionize" -> sessionize,
    "q_sql_tempview" -> sqlTempView,
  )

  val oracles: Map[String, String] = Map(
    "q_tumbling_window" -> tumblingWindowSql,
    "q_sliding_window" -> slidingWindowSql,
    "q_stream_window" -> streamWindowSql,
    "q_stream_sessions" -> streamSessionsSql,
    "q_stream_sessions_custom" -> streamSessionsCustomSql,
    "q_stream_late_data" -> streamLateDataSql,
    "q_stream_dedup" -> streamDedupSql,
    "q_stream_restart" -> streamWindowSql,
    "q_stream_join" -> streamJoinSql,
    "q_stream_outer_join" -> streamOuterJoinSql,
    "q_stream_static_join" -> streamStaticJoinSql,
    "q_stream_user_state" -> streamUserStateSql,
    "q_stream_available_now" -> streamAvailableNowSql,
    "q_sessionize" -> sessionizeSql,
    "q_sql_tempview" -> sqlTempViewSql,
  )
}
