package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.Streaming.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String, Double)*): Seq[Event] =
    rows.map { case (id, t, u, ty, v) => Event(id, ts(t), u, ty, v) }

  test("windowed counts emit closed windows after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append).start()
    input.addData(events(
      (1, "2024-01-01 10:05:00", 1, "click", 1.0),
      (2, "2024-01-01 10:45:00", 2, "click", 2.0),
      (3, "2024-01-01 10:50:00", 1, "view", 3.0)): _*)
    q.processAllAvailable()
    // watermark still at epoch -> nothing finalized yet in Append mode
    // advance event time past 12:00 so the 10:00 window closes
    input.addData(events((4, "2024-01-01 13:00:00", 3, "click", 4.0)): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wc")
      .select($"window_start".cast("string"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toSet
    assert(out.contains(("2024-01-01 10:00:00", "click", 2L)))
    assert(out.contains(("2024-01-01 10:00:00", "view", 1L)))
  }

  test("session windows close on 30-minute gaps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.sessionWindows(input.toDF())
      .writeStream.format("memory").queryName("sw").outputMode(OutputMode.Append).start()
    // user 1: two events 10 min apart (one session), then a 2h gap (new one)
    input.addData(events(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:10:00", 1, "click", 1.0),
      (3, "2024-01-01 12:30:00", 1, "click", 1.0)): _*)
    q.processAllAvailable()
    input.addData(events((4, "2024-01-01 18:00:00", 2, "click", 1.0)): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sw")
      .select($"session_start".cast("string"), $"user_id", $"n_events")
      .as[(String, Long, Long)].collect().toSet
    assert(out.contains(("2024-01-01 10:00:00", 1L, 2L)))
    assert(out.contains(("2024-01-01 12:30:00", 1L, 1L)))
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("us").outputMode(OutputMode.Update).start()
    input.addData(events((1, "2024-01-01 10:00:00", 1, "click", 2.5)): _*)
    q.processAllAvailable()
    input.addData(events(
      (2, "2024-01-01 11:00:00", 1, "view", 1.5),
      (3, "2024-01-01 11:30:00", 2, "click", 7.0)): _*)
    q.processAllAvailable()
    q.stop()
    // Update mode: latest row per user wins
    val out = spark.table("us")
      .orderBy($"last_ts".desc)
      .as[Streaming.UserStats].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.head }
    assert(out(1L).n_events == 2 && math.abs(out(1L).total_value - 4.0) < 1e-9)
    assert(out(2L).n_events == 1 && out(2L).total_value == 7.0)
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append).start()
    input.addData(events(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (1, "2024-01-01 10:00:00", 1, "click", 1.0)): _*)
    q.processAllAvailable()
    // same id arriving again in a later micro-batch, still inside horizon
    input.addData(events(
      (1, "2024-01-01 10:10:00", 1, "click", 1.0),
      (2, "2024-01-01 10:20:00", 1, "view", 2.0)): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dd").select($"event_id").as[Long].collect().toSeq
    assert(out.sorted == Seq(1L, 2L))
  }

  test("stream-static join enriches events from a broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "engagement"), ("view", "passive"))
      .toDF("event_type", "category")
    val input = MemoryStream[Event]
    val q = Streaming.enrichStream(input.toDF(), dim, "event_type")
      .writeStream.format("memory").queryName("en").outputMode(OutputMode.Append).start()
    input.addData(events(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:01:00", 2, "purchase", 5.0)): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("en").select($"event_id", $"category")
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("engagement"))
    assert(out(2L).isEmpty) // left join keeps unmatched stream rows
  }

  test("file-source streaming reads the real events table incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .limit(500).write.mode("overwrite").parquet(dir)
    val counts = Streaming.windowedCounts(Streaming.readEventStream(spark, dir))
    val q = counts.writeStream.format("memory").queryName("fs")
      .outputMode(OutputMode.Complete).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("fs").count() > 0)
  }

  test("stream-stream interval join attributes conversions within the window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.attributeConversions(input.toDF(), "view", "purchase")
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    input.addData(events(
      (1, "2024-01-01 10:00:00", 1, "view", 0.0),
      (2, "2024-01-01 10:05:00", 1, "purchase", 9.99), // 5 min after view -> match
      (3, "2024-01-01 10:00:00", 2, "view", 0.0),
      (4, "2024-01-01 10:20:00", 2, "purchase", 5.0), // 20 min -> outside window
      (5, "2024-01-01 10:06:00", 3, "purchase", 1.0)): _*) // no prior view
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attr")
      .select($"user_id", $"cause_id", $"effect_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L)))
  }

  test("foreachBatch streams into TableLog exactly-once (re-delivered batch is a no-op)") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_tlsink_src").toString
    val tblDir = java.nio.file.Files.createTempDirectory("graft_tlsink_tbl").toString
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"event_type").orderBy($"event_id").limit(800)
      .localCheckpoint()
    events.write.mode("overwrite").parquet(srcDir)
    var lastBatch: Option[(org.apache.spark.sql.DataFrame, Long)] = None
    val q = spark.readStream.schema(events.schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        lastBatch = Some((batch.localCheckpoint(), id))
        graft.core.TableLog.appendIdempotent(spark, tblDir, batch, s"tlsink-$id")
        ()
      }
      .option("checkpointLocation", srcDir + "_ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(graft.core.TableLog.read(spark, tblDir).count() == 800)
    // simulate the crash-replay Structured Streaming guarantees: the same
    // micro-batch delivered again must not double the data
    val (b, id) = lastBatch.get
    assert(graft.core.TableLog.appendIdempotent(
      spark, tblDir, b, s"tlsink-$id").isEmpty)
    assert(graft.core.TableLog.read(spark, tblDir).count() == 800)
  }

  test("foreachBatch maintains the incremental rollup (+KMV sketch) from a stream") {
    // the streaming twin of IncrementalRollupSpec: micro-batches land in
    // persisted mergeable state; the final state equals a one-shot batch
    // aggregate over everything that streamed through
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sroll_src").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_sroll_st").toString
    // `limit` without ordering may pick different rows per evaluation, so
    // pin a deterministic 1500-row set (sorted by event_id) and split it by
    // an id cutoff — batch 2 is the exact complement of batch 1
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", $"value")
    val all = events.orderBy($"event_id").limit(1500).localCheckpoint()
    val cut = all.select($"event_id").orderBy($"event_id")
      .collect().map(_.getLong(0)).apply(999)
    all.filter($"event_id" <= cut).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.core.IncrementalRollup.update(spark, stateDir, batch,
          Seq("event_type"), "value", distinctCol = Some("user_id"))
      }
      .option("checkpointLocation", srcDir + "_ckpt")
      .start()
    q.processAllAvailable()
    // stream in a second file -> another micro-batch merges into state
    all.filter($"event_id" > cut).write.mode("append").parquet(srcDir)
    q.processAllAvailable()
    q.stop()
    val state = graft.core.IncrementalRollup.result(spark, stateDir)
      .select($"event_type", $"cnt", $"sum_value", $"approx_distinct")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val oneShot = graft.core.IncrementalRollup
      .partial(all, Seq("event_type"), "value", Some("user_id"))
      .select($"event_type", $"cnt",
        ($"sum_cents".cast("double") / 100.0).as("sum_value"),
        graft.ops.Sketches.kmvEstimate($"kmv", graft.core.IncrementalRollup.KmvK)
          .as("approx_distinct"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(state == oneShot, s"state=$state oneShot=$oneShot")
  }

  test("gated stream window: multi-micro-batch state merge equals the batch result") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    // split the events table into 6 files -> 6 micro-batches
    // (maxFilesPerTrigger=1 in the helper), so window state MERGES
    // across batches instead of being computed in one pass
    val dir = graft.queries.Scratch.dir("spec_stream_events")
    graft.queries.Scratch.wipe(dir)
    spark.read.parquet(sf + "/events.parquet")
      .repartition(6).write.mode("overwrite").parquet(dir)
    val streamed = graft.queries.EventOps.streamWindowOver(
      spark, dir, glob = "*.parquet", sink = "spec_stream_sink")
      .collect().toSeq
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Num.microSum(col("value")).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect().toSeq
    assert(streamed.size > 10)
    assert(streamed == batch)
  }

  test("RocksDB state store: the at-scale backend reproduces the default provider's result") {
    // The HDFS-backed store keeps every key in executor heap — at 100 TB
    // stream volumes (billions of dedup/session keys) the JVM heap is the
    // ceiling; RocksDBStateStoreProvider spills state to local SSD with
    // bounded memory, which is what production sizes for. The gate:
    // identical results from the same multi-micro-batch pipeline under
    // both providers.
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val dir = graft.queries.Scratch.dir("spec_rocksdb_events")
    graft.queries.Scratch.wipe(dir)
    spark.read.parquet(sf + "/events.parquet")
      .repartition(6).write.mode("overwrite").parquet(dir)
    val default = graft.queries.EventOps.streamWindowOver(
      spark, dir, glob = "*.parquet", sink = "spec_rocks_base_sink")
      .collect().toSeq
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      val rocks = graft.queries.EventOps.streamWindowOver(
        spark, dir, glob = "*.parquet", sink = "spec_rocks_sink")
        .collect().toSeq
      assert(rocks.size > 10)
      assert(rocks == default, "RocksDB state store changed the result")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("stream restart: mid-stream stop + cold restart from checkpoint equals batch") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val dir = graft.queries.Scratch.dir("spec_restart_events")
    graft.queries.Scratch.wipe(dir)
    spark.read.schema(graft.queries.EventOps.eventSchema)
      .parquet(sf + "/events.parquet")
      .repartition(4, col("event_id")).write.mode("overwrite").parquet(dir)
    val sink = "spec_restart_sink"
    val ckpt = graft.queries.Scratch.dir("spec_restart_ckpt")
    graft.queries.Scratch.wipe(ckpt)
    spark.catalog.dropTempView(sink)
    // phase 1: only 2 of the 4 files visible, then STOP — offsets + agg
    // state survive only in the checkpoint
    graft.queries.EventOps.restartRun(spark, dir, "part-0000[01]*", sink, ckpt)
    val partial = spark.table(sink).agg(sum(col("n_events"))).head.getLong(0)
    // phase 2: brand-new query, same checkpoint, all files visible
    graft.queries.EventOps.restartRun(spark, dir, "part-*", sink, ckpt)
    val full = spark.table(sink).orderBy(col("window_start"), col("event_type"))
      .collect().toSeq
    val fullEvents = spark.table(sink).agg(sum(col("n_events"))).head.getLong(0)
    // the stop was genuinely mid-stream...
    assert(partial > 0 && partial < fullEvents, s"partial=$partial full=$fullEvents")
    // ...and recovery neither re-read committed files nor dropped state
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Num.microSum(col("value")).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect().toSeq
    assert(full == batch)
  }

  test("custom-state session merge: out-of-order arrival, exact gap boundary") {
    import graft.queries.EventOps.{SIv, mergeSessions}
    val gap = 1800L
    def us(sec: Long): Long = sec * 1000000L
    // out-of-order singletons chain into one session when each hole <= gap
    val chained = mergeSessions(
      Seq(SIv(us(4000), us(4000), 1), SIv(us(1000), us(1000), 1),
        SIv(us(2500), us(2500), 1)), gap)
    assert(chained == Seq(SIv(us(1000), us(4000), 3)))
    // a gap of exactly 1800s CONTINUES the session (batch rule is > 1800)
    assert(mergeSessions(
      Seq(SIv(us(0), us(0), 1), SIv(us(1800), us(1800), 1)), gap).size == 1)
    // 1801s splits
    assert(mergeSessions(
      Seq(SIv(us(0), us(0), 1), SIv(us(1801), us(1801), 1)), gap).size == 2)
    // the gap compares SECOND-FLOORED endpoints: 1800.9s raw is 1800s
    // floored -> still one session (matching date_diff('second') exactly)
    assert(mergeSessions(
      Seq(SIv(0, 0, 1), SIv(1800900000L, 1800900000L, 1)), gap).size == 1)
    // a bridging event merges two established intervals and sums counts
    val bridged = mergeSessions(
      Seq(SIv(us(0), us(1000), 3), SIv(us(4000), us(5000), 2),
        SIv(us(2500), us(2500), 1)), gap)
    assert(bridged == Seq(SIv(us(0), us(5000), 6)))
  }
}
