package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Write-write conflict semantics for the NON-append commits: racing
  * rewrites of the same file must abort one writer (who retries the whole
  * operation against the new tip), while disjoint-file rewrites commit
  * on both sides. Appends already race safely (TableLogCheckpointSpec).
  */
class TableLogConflictSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_tlog_conflict").toString

  /** Re-run `op` on ConcurrentModificationException — the documented
    * client contract for losing a rewrite race (re-read, re-compute,
    * re-commit; the loser's second pass sees the winner's rows).
    */
  private def withRetry[T](op: => T, maxAttempts: Int = 10): (T, Int) = {
    var attempts = 0
    while (true) {
      attempts += 1
      try return (op, attempts)
      catch {
        case _: java.util.ConcurrentModificationException
          if attempts < maxAttempts => ()
      }
    }
    sys.error("unreachable")
  }

  test("concurrent upserts touching the same file: one aborts, retry lands both") {
    val dir = freshDir()
    // ONE data file -> every key-touching rewrite targets the same file
    TableLog.append(spark, dir,
      spark.range(0, 100).select($"id", lit(0L).as("ver")).coalesce(1))
    val writers = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val retries = new java.util.concurrent.atomic.AtomicInteger(0)
    val futs = (1 to writers).map { w =>
      scala.concurrent.Future {
        val (_, attempts) = withRetry {
          TableLog.upsert(spark, dir,
            Seq((w.toLong, 100L + w)).toDF("id", "ver").coalesce(1), Seq("id"))
        }
        retries.addAndGet(attempts - 1)
      }
    }
    try futs.foreach(scala.concurrent.Await.result(_,
      scala.concurrent.duration.Duration.Inf))
    finally pool.shutdown()
    // all four updates present exactly once — a lost rewrite would drop a
    // winner's update (stale survivors) or duplicate a key
    val got = TableLog.read(spark, dir)
      .filter($"id".between(1, writers)).orderBy($"id")
      .as[(Long, Long)].collect().toSeq
    assert(got == (1 to writers).map(w => (w.toLong, 100L + w)).toSeq, got)
    assert(TableLog.read(spark, dir).count() == 100)
    assert(TableLog.read(spark, dir).groupBy($"id").count()
      .filter($"count" > 1).isEmpty, "duplicate keys after racing upserts")
  }

  test("upserts rewriting DISJOINT files both commit") {
    val dir = freshDir()
    // two partitions -> two files; key 5 lives in p=0, key 6 in p=1
    TableLog.append(spark, dir,
      spark.range(0, 100).select($"id", ($"id" % 2).as("p"), lit(0L).as("ver"))
        .repartition(2, $"p"),
      partitionBy = Seq("p"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val futs = Seq((4L, 0L), (7L, 1L)).map { case (k, p) =>
      scala.concurrent.Future {
        val (_, n) = withRetry {
          TableLog.upsert(spark, dir,
            Seq((k, p, 500L + k)).toDF("id", "p", "ver").coalesce(1),
            Seq("id"), partitionBy = Seq("p"))
        }
        attempts.addAndGet(n)
      }
    }
    try futs.foreach(scala.concurrent.Await.result(_,
      scala.concurrent.duration.Duration.Inf))
    finally pool.shutdown()
    val got = TableLog.read(spark, dir).filter($"id".isin(4L, 7L))
      .select($"id", $"ver").orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((4L, 504L), (7L, 507L)), got)
    assert(TableLog.read(spark, dir).count() == 100)
  }

  test("deleteWhere racing a compact of the same file aborts the delete") {
    val dir = freshDir()
    TableLog.append(spark, dir,
      spark.range(0, 50).select($"id", lit("x").as("v")).coalesce(1))
    // simulate the interleave deterministically through the guard itself:
    // the delete computed survivors against file F; the racing compact's
    // commit removed F, so the delete's rebase must throw, not commit
    intercept[java.util.ConcurrentModificationException] {
      TableLog.rebaseCompaction("t", Set("F"), Seq("F2"), "delete")(
        Seq("compacted-0"))
    }
    // and end-to-end: a real compact between the delete's read and commit
    // is indistinguishable from a racing one — run delete AFTER compact
    // rewired the file names and confirm it still lands (fresh read path)
    TableLog.compact(spark, dir, targetBytes = 1L << 30)
    val (_, n) = TableLog.deleteWhere(spark, dir, $"id" < 5)
    assert(n >= 1)
    assert(TableLog.read(spark, dir).count() == 45)
  }

  test("delta write validates against the PINNED snapshot: a compaction " +
    "landing between scan analysis and write construction aborts the commit") {
    // ADVICE round-8: deltaWriteSpec used to re-read the tip when the
    // write was constructed, so a compaction in that window slipped past
    // the snapFiles.subsetOf(base) check while the dv positions targeted
    // files already gone — the delete half of an UPDATE silently inert.
    val dir = freshDir()
    TableLog.append(spark, dir,
      spark.range(0, 60).select($"id", ($"id" % 3).as("v")).coalesce(1))
    // the scan's pinned snapshot (what GraftTable.lines holds at analysis)
    val pinned = TableLog.manifestLines(spark, dir,
      TableLog.versions(spark, dir).last)
    val spec = TableLog.deltaWriteSpec(spark, dir, Seq.empty, Some(pinned))
    assert(spec.snapFiles == pinned.filterNot(_.startsWith("#")).toSet)
    // the race: a compaction rewrites every file before the write commits
    TableLog.compact(spark, dir, targetBytes = 1L << 30)
    // the OLD (re-read-tip) spec would now "validate" against the
    // compacted tip and pass — the pinned spec must abort instead
    val tipSpec = TableLog.deltaWriteSpec(spark, dir, Seq.empty)
    assert(tipSpec.snapFiles != spec.snapFiles,
      "compaction did not change the file set; test is vacuous")
    intercept[java.util.ConcurrentModificationException] {
      TableLog.commitDelta(spark, dir,
        added = Seq.empty, dvSidecars = Seq("_graft_dv/ghost/d.parquet"),
        snapFiles = spec.snapFiles, op = "update_delta",
        statsCols = Seq.empty, snapDv = spec.snapDv)
    }
  }

  test("serializable isolation: a row-level delta racing a dv delete " +
    "aborts; snapshot isolation composes") {
    // ADVICE round-8: serializableGuard only inspects added DATA files, so
    // a MERGE racing a deleteWhereDv of the same snapshot used to compose
    // even under serializable — the merge's re-inserted image resurrecting
    // the concurrently deleted row (Iceberg validates conflicting delete
    // files for RowDelta; commitDelta now checks the dv/eq line drift).
    val dir = freshDir()
    TableLog.append(spark, dir,
      spark.range(0, 40).select($"id", ($"id" % 4).as("v")).coalesce(1))
    val dataFile = TableLog.manifestLines(spark, dir,
      TableLog.versions(spark, dir).last).filterNot(_.startsWith("#")).head
    // the delta write's read snapshot: no dv lines yet
    val spec = TableLog.deltaWriteSpec(spark, dir, Seq.empty)
    assert(spec.snapDv.isEmpty)
    // racing dv delete commits first (adds a #dvp line, no file change —
    // exactly the drift the file-only guard cannot see)
    TableLog.deleteWhereDv(spark, dir, $"id" === 7L)
    // a REAL staged sidecar so the composing commit leaves a valid table
    val stagedDir = "_graft_dv/race-delta"
    Seq((dataFile, 3L)).toDF("_dv_file", "_dv_idx")
      .coalesce(1).write.parquet(s"$dir/$stagedDir")
    val staged = new java.io.File(s"$dir/$stagedDir").listFiles()
      .map(_.getName).filter(_.startsWith("part-"))
      .map(n => s"$stagedDir/$n").toSeq
    assert(staged.size == 1)
    spark.conf.set("spark.graft.commit.isolation", "serializable")
    try {
      val ex = intercept[java.util.ConcurrentModificationException] {
        TableLog.commitDelta(spark, dir,
          added = Seq.empty, dvSidecars = staged,
          snapFiles = spec.snapFiles, op = "merge_delta",
          statsCols = Seq.empty, snapDv = spec.snapDv)
      }
      assert(ex.getMessage.contains("dv/eq sidecar"))
    } finally spark.conf.set("spark.graft.commit.isolation", "snapshot")
    // under the default snapshot isolation the same delta composes: both
    // deletes land (id=7 from the racing delete, id=3 from this delta)
    // — cleanup() on the aborted attempt must NOT have swept the staged
    // sidecar... it did (documented abort contract), so re-stage it
    val restaged = {
      Seq((dataFile, 3L)).toDF("_dv_file", "_dv_idx")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$stagedDir")
      new java.io.File(s"$dir/$stagedDir").listFiles()
        .map(_.getName).filter(_.startsWith("part-"))
        .map(n => s"$stagedDir/$n").toSeq
    }
    val specNow = TableLog.deltaWriteSpec(spark, dir, Seq.empty)
    TableLog.commitDelta(spark, dir,
      added = Seq.empty, dvSidecars = restaged,
      snapFiles = specNow.snapFiles, op = "merge_delta",
      statsCols = Seq.empty, snapDv = specNow.snapDv)
    assert(TableLog.read(spark, dir).count() == 38)
    assert(TableLog.read(spark, dir)
      .filter($"id" === 3L || $"id" === 7L).count() == 0)
  }

  test("compactDeletes on a never-committed table returns zeros, not " +
    "NoSuchElementException") {
    val dir = freshDir()
    assert(TableLog.compactDeletes(spark, dir) == (0L, 0L, 0L))
  }
}
