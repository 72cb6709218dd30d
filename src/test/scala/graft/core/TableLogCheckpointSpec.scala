package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The checkpointed log: delta (`.delta`) commits between full-snapshot
  * checkpoint manifests. Every test here runs the SAME operation
  * sequences through both formats (checkpointInterval=1, the legacy
  * all-manifests layout, vs a small interval that forces multi-delta
  * resolution) and requires identical query results — the format is an
  * encoding of the log, never of the table's semantics.
  */
class TableLogCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_tlog_ckpt").toString

  private def withInterval[T](k: Int)(body: => T): T = {
    val key = "spark.graft.tablelog.checkpointInterval"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, k.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def logFiles(dir: String): Seq[String] =
    new java.io.File(dir, "_graft_log").listFiles().toSeq
      .map(_.getName).filterNot(_.startsWith(".")).sorted

  /** One mixed workload: appends, a copy-on-write delete, an upsert, a
    * dv (merge-on-read) delete, a compact, a restore. Returns the dir.
    */
  private def mixedWorkload(dir: String): Unit = {
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select($"id", ($"id" % 7).as("grp")).coalesce(1)
    TableLog.append(spark, dir, batch(0, 100), statsCol = Some("id"))    // v1
    TableLog.append(spark, dir, batch(100, 200), statsCol = Some("id"))  // v2
    TableLog.deleteWhere(spark, dir, $"id" % 10 === 0)                   // v3
    TableLog.append(spark, dir, batch(200, 300), statsCol = Some("id"))  // v4
    TableLog.upsert(spark, dir,
      Seq((5L, 99L), (1000L, 0L)).toDF("id", "grp"), Seq("id"))          // v5
    TableLog.deleteWhereDv(spark, dir, $"id" === 7L)                     // v6
    TableLog.compact(spark, dir, targetBytes = 1L << 30)                 // v7
    TableLog.append(spark, dir, batch(300, 350), statsCol = Some("id"))  // v8
    TableLog.restore(spark, dir, 4)                                      // v9
    TableLog.append(spark, dir, batch(350, 400), statsCol = Some("id"))  // v10
  }

  private def signature(dir: String, v: Option[Long] = None): Seq[(Long, Long)] =
    TableLog.read(spark, dir, version = v)
      .groupBy($"grp").agg(sum($"id").as("s"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("delta format is result-identical to the all-manifests format") {
    val legacy = freshDir()
    val ckpt = freshDir()
    withInterval(1) { mixedWorkload(legacy) }
    withInterval(4) { mixedWorkload(ckpt) }
    // both logs list the same versions, and at EVERY version the two
    // tables answer identically (grouped signature covers rows + values)
    val vs = TableLog.versions(spark, legacy)
    assert(TableLog.versions(spark, ckpt) == vs)
    vs.foreach { v =>
      assert(signature(ckpt, Some(v)) == signature(legacy, Some(v)),
        s"divergence at version $v")
    }
    // the checkpointed log actually used deltas: every version commits
    // through its .delta (the format-neutral CAS path), and v1/v4/v8
    // additionally materialized checkpoint manifests
    val names = logFiles(ckpt)
    assert(names.count(_.endsWith(".manifest")) == 3, names.mkString(","))
    assert(names.count(_.endsWith(".delta")) == 10, names.mkString(","))
    // history reads identically through deltas (op labels + file counts)
    val h = (d: String) => TableLog.history(spark, d)
      .select("version", "operation", "n_files")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(h(ckpt) == h(legacy))
  }

  test("delta commits cost O(changed), not O(files)") {
    val dir = freshDir()
    val row = Seq((1L, "x")).toDF("k", "v").coalesce(1)
    withInterval(10) { (1 to 40).foreach(_ => TableLog.append(spark, dir, row)) }
    val log = new java.io.File(dir, "_graft_log")
    val byExt = log.listFiles().filterNot(_.getName.startsWith("."))
      .groupBy(f => f.getName.split('.').last)
      .map { case (ext, fs) => ext -> fs.map(_.length()).toSeq }
    // a delta of a 1-file append holds ~3 lines regardless of table size;
    // the version-40 checkpoint manifest lists all 40 files
    val maxDelta = byExt("delta").max
    val maxManifest = byExt("manifest").max
    assert(maxDelta * 5 < maxManifest,
      s"deltas not O(changed): max delta $maxDelta B vs manifest $maxManifest B")
    // and the table still reads whole
    assert(TableLog.read(spark, dir).count() == 40)
  }

  test("vacuum materializes a delta floor into a checkpoint") {
    val dir = freshDir()
    withInterval(10) {
      val row = (i: Int) => Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1)
      (1 to 7).foreach(i => TableLog.append(spark, dir, row(i)))
      val tsAtFloor = {
        // floor will be v5 (keepVersions=3 of 7): record its commit time
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getFileStatus(new org.apache.hadoop.fs.Path(
          s"$dir/_graft_log/${f"${5L}%020d"}.delta")).getModificationTime
      }
      TableLog.vacuum(spark, dir, keepVersions = 3, retainMs = 0L)
      // only v5..v7 remain; v5 (was a delta) is now a full manifest
      assert(TableLog.versions(spark, dir) == Seq(5L, 6L, 7L))
      val names = logFiles(dir)
      assert(names.contains(f"${5L}%020d" + ".manifest"), names.mkString(","))
      assert(!names.contains(f"${5L}%020d" + ".delta"), names.mkString(","))
      // all retained versions resolve (v6/v7 deltas replay off the
      // materialized v5), and the floor kept its original commit time so
      // TIMESTAMP AS OF still answers exactly
      assert(TableLog.read(spark, dir, Some(5L)).count() == 5)
      assert(TableLog.read(spark, dir, Some(7L)).count() == 7)
      assert(TableLog.versionAsOf(spark, dir, tsAtFloor) >= 5L)
      // and later commits keep working on the swapped log
      TableLog.append(spark, dir, row(8))
      assert(TableLog.read(spark, dir).count() == 8)
    }
  }

  test("idempotent appends skip tokens recorded in delta commits") {
    val dir = freshDir()
    withInterval(10) {
      val row = Seq((1L, "x")).toDF("k", "v").coalesce(1)
      TableLog.append(spark, dir, row)                                  // v1 manifest
      assert(TableLog.appendIdempotent(spark, dir, row, "tok-a").isDefined) // v2 delta
      assert(TableLog.appendIdempotent(spark, dir, row, "tok-a").isEmpty)   // replay
      assert(TableLog.committedTxns(spark, dir) == Set("tok-a"))
      assert(TableLog.read(spark, dir).count() == 2)
    }
  }

  test("racing writers through the delta path: linear versions, no lost update") {
    val dir = freshDir()
    withInterval(4) {
      // seed so racers contend on an existing log, not table creation
      TableLog.append(spark, dir,
        Seq((0L, -1)).toDF("k", "writer").coalesce(1))
      val writers = 4
      val each = 6
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fs = (0 until writers).map { w =>
        scala.concurrent.Future {
          (0 until each).foreach { i =>
            TableLog.append(spark, dir,
              Seq((w * 1000L + i, w)).toDF("k", "writer").coalesce(1))
          }
        }
      }
      try fs.foreach(scala.concurrent.Await.result(_,
        scala.concurrent.duration.Duration.Inf))
      finally pool.shutdown()
      // every commit won a distinct version: contiguous 1..(1 + w*each),
      // resolvable at the tip, with every writer's every row present —
      // a lost update (a delta diffed against a stale tip) would drop rows
      val vs = TableLog.versions(spark, dir)
      assert(vs == (1L to (1 + writers * each)).toSeq, s"versions $vs")
      val got = TableLog.read(spark, dir)
        .select($"k").as[Long].collect().toSet
      val want = (Set(0L) ++ (for (w <- 0 until writers; i <- 0 until each)
        yield w * 1000L + i).toSet)
      assert(got == want, s"missing: ${want -- got}; extra: ${got -- want}")
    }
  }

  test("writers with DIFFERENT checkpoint intervals race without lost updates") {
    // The scenario the format-neutral CAS exists for: a k=1 writer and a
    // k=10 writer racing the same version. Before the delta-path CAS, one
    // would create <v>.manifest and the other <v>.delta — both "winning"
    // v, and since logFileOf prefers the manifest, the delta writer's
    // commit (and its rows) silently vanished. Now both contend on
    // <v>.delta and exactly one wins per version.
    val dir = freshDir()
    val sessions = Seq(1, 10).map { k =>
      val s = spark.newSession()
      s.conf.set("spark.graft.tablelog.checkpointInterval", k.toString)
      s
    }
    TableLog.append(spark, dir, Seq((0L, -1)).toDF("k", "writer").coalesce(1))
    val each = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = sessions.zipWithIndex.map { case (s, w) =>
      scala.concurrent.Future {
        import s.implicits._
        (0 until each).foreach { i =>
          TableLog.append(s, dir,
            Seq((w * 1000L + i, w)).toDF("k", "writer").coalesce(1))
        }
      }
    }
    try futs.foreach(scala.concurrent.Await.result(_,
      scala.concurrent.duration.Duration.Inf))
    finally pool.shutdown()
    val vs = TableLog.versions(spark, dir)
    assert(vs == (1L to (1 + 2 * each)).toSeq, s"versions $vs")
    val got = TableLog.read(spark, dir).select($"k").as[Long].collect().toSet
    val want = Set(0L) ++ (for (w <- 0 until 2; i <- 0 until each)
      yield w * 1000L + i).toSet
    assert(got == want, s"missing: ${want -- got}; extra: ${got -- want}")
  }

  test("a table recreated at the same path never serves the old cache") {
    val dir = freshDir()
    withInterval(10) {
      val row = (i: Int) => Seq((i.toLong, s"a$i")).toDF("k", "v").coalesce(1)
      (1 to 3).foreach(i => TableLog.append(spark, dir, row(i)))
      assert(TableLog.read(spark, dir).count() == 3)
      // drop the table on disk and rebuild DIFFERENT content at the path
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val row2 = (i: Int) => Seq((i.toLong, s"b$i"), (i + 100L, s"b$i"))
        .toDF("k", "v").coalesce(1)
      (1 to 3).foreach(i => TableLog.append(spark, dir, row2(i)))
      // resolution must reflect the NEW log (6 rows), not cached state
      assert(TableLog.read(spark, dir, Some(3L)).count() == 6)
    }
  }
}
