package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.core.TableLog

/** TableLog change feed as a STREAMING source (`readChangeFeed` — the
  * Delta streaming-CDF role): typed change rows per micro-batch, exact
  * row-level DML classification, checkpoint restart replaying exactly
  * the missed versions, and `startingVersion` subscription.
  */
class TableLogCdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val provider = classOf[TableLogStreamProvider].getName

  private def freshWh(name: String): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory(name)
    java.nio.file.Files.delete(d)
    val cat = name.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d.toString)
    (d.toString, cat)
  }

  /** Drain all available versions through the CDC source into `sink`. */
  private def drain(dir: String, ck: String,
                    sink: scala.collection.mutable.ArrayBuffer[(Long, Long, String, Long)],
                    extra: Map[String, String] = Map.empty): Unit = {
    val reader = extra.foldLeft(
      spark.readStream.format(provider).option("path", dir)
        .option("readChangeFeed", "true").option("keys", "id"))(
      (r, kv) => r.option(kv._1, kv._2))
    val q = reader.load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select(col("id"), col("v"), col("_change_type"),
            col("_commit_version"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getLong(3)))
        sink.synchronized { sink ++= rows }; ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("UPDATE + MERGE window: streamed change rows equal the batch " +
    "changes() feed, across restarts, with no duplicates") {
    val (wh, cat) = freshWh("graft_cdc_dml")
    val dir = s"$wh/s/t"
    val ck = java.nio.file.Files.createTempDirectory("graft_cdc_ck").toString
    TableLog.append(spark, dir,
      spark.range(0, 60).filter($"id" % 3 === 0)
        .select($"id", ($"id" * 10).as("v")).coalesce(1))            // v1
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    drain(dir, ck, sink)                                             // sees v1
    assert(sink.count(_._3 == "insert") == 20 && sink.size == 20)

    spark.sql(s"UPDATE $cat.s.t SET v = -1 WHERE id % 6 = 0")        // v2
    spark.range(0, 60).filter($"id" % 2 === 0)
      .select($"id", lit(7L).as("v")).createOrReplaceTempView("cdc_src")
    spark.sql(s"""MERGE INTO $cat.s.t t USING cdc_src s ON t.id = s.id
      WHEN MATCHED AND s.id % 30 = 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")    // v3
    drain(dir, ck, sink)                                             // v2 + v3 ONLY
    val tip = TableLog.versions(spark, dir).last
    val expected = TableLog.changes(spark, dir, 0, tip, Seq("id"))
      .select($"id", $"v", $"_change_type", $"_commit_version")
      .as[(Long, Long, String, Long)].collect()
    // multiset equality with the batch feed: restart delivered exactly
    // the missed versions — nothing dropped, nothing replayed twice
    assert(sink.sorted.toSeq == expected.sorted.toSeq,
      s"stream=${sink.size} batch=${expected.length}")
  }

  test("startingVersion subscribes at the tip: history is not replayed") {
    val (wh, cat) = freshWh("graft_cdc_sv")
    val dir = s"$wh/s/u"
    val ck = java.nio.file.Files.createTempDirectory("graft_cdc_ck2").toString
    TableLog.append(spark, dir,
      spark.range(0, 50).select($"id", $"id".as("v")).coalesce(1))   // v1
    val tip = TableLog.versions(spark, dir).last
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    drain(dir, ck, sink, Map("startingVersion" -> tip.toString))
    assert(sink.isEmpty, s"history leaked: $sink")
    spark.sql(s"UPDATE $cat.s.u SET v = 0 WHERE id = 7")             // v2
    drain(dir, ck, sink, Map("startingVersion" -> tip.toString))
    assert(sink.map(_._3).sorted.toSeq ==
      Seq("update_postimage", "update_preimage") &&
      sink.forall(_._1 == 7L), sink)
  }

  test("rate limit: maxVersionsPerTrigger bounds each catch-up batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_rate").toString
    (1 to 6).foreach(i => TableLog.append(spark, dir,
      Seq((i.toLong, i.toLong)).toDF("id", "v").coalesce(1)))        // v1..v6
    val ck = java.nio.file.Files.createTempDirectory("graft_cdc_ck3").toString
    val versionsPerBatch = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format(provider).option("path", dir)
      .option("readChangeFeed", "true").option("keys", "id")
      .option("maxVersionsPerTrigger", "2").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.select("_commit_version").distinct().count()
        versionsPerBatch.synchronized { versionsPerBatch += n }; ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.ProcessingTime(50)).start()
    eventually(versionsPerBatch.synchronized(versionsPerBatch.sum) == 6L,
      timeoutMs = 60000)
    q.stop()
    assert(versionsPerBatch.forall(_ <= 2L), versionsPerBatch)
  }

  test("a vacuumed window is refused up front with retention advice, " +
    "not a mid-batch FileNotFoundException") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_vac").toString
    (1 to 6).foreach(i => TableLog.append(spark, dir,
      Seq((i.toLong, i.toLong)).toDF("id", "v").coalesce(1)))        // v1..v6
    TableLog.vacuum(spark, dir, keepVersions = 3, retainMs = 0L)     // keep v4..v6
    val ck = java.nio.file.Files.createTempDirectory("graft_cdc_ck4").toString
    val q = spark.readStream.format(provider).option("path", dir)
      .option("readChangeFeed", "true").option("keys", "id").load()
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(60000)
    }
    assert(e.getCause.getMessage.contains("vacuum"), e.getCause.getMessage)
    // subscribing inside retention works
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    drain(dir, java.nio.file.Files.createTempDirectory("graft_cdc_ck5").toString,
      sink, Map("startingVersion" -> "4"))
    assert(sink.map(_._1).sorted.toSeq == Seq(5L, 6L), sink)
  }

  private def eventually(cond: => Boolean, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(cond, "condition not met within timeout")
  }
}
