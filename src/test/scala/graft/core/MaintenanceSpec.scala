package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("clusterBy and zorderBy together are rejected, not silently dropped") {
    intercept[IllegalArgumentException] {
      Maintenance.compact(spark, "/tmp/never-touched",
        clusterBy = Seq("k"), zorderBy = Some(("x", "y")))
    }
  }

  test("compact merges small files, preserves data, survives re-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // simulate per-batch appends: 20 tiny files
    (1 to 20).foreach { i =>
      spark.range((i - 1) * 100, i.toLong * 100)
        .select($"id", ($"id" % 7).as("k"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val beforeData = spark.read.parquet(dir).orderBy("id").collect()
    val (nBefore, nAfter) = Maintenance.compact(spark, dir, targetBytes = 1L << 30)
    assert(nBefore >= 20 && nAfter == 1, s"$nBefore -> $nAfter")
    val afterData = spark.read.parquet(dir).orderBy("id").collect()
    assert(afterData.sameElements(beforeData))
  }

  test("recovery: pre-commit crash keeps old data; post-commit crash completes swap") {
    // --- pre-commit: stale tmp, no marker -> tmp discarded, data untouched
    val dir1 = java.nio.file.Files.createTempDirectory("graft_rec1").toString
    spark.range(0, 100).select($"id").coalesce(1)
      .write.mode("append").parquet(dir1)
    val before = spark.read.parquet(dir1).orderBy("id").collect()
    spark.range(500, 510).select($"id") // staged-but-uncommitted garbage
      .coalesce(1).write.mode("overwrite").parquet(s"$dir1/.compact_tmp")
    Maintenance.recover(spark, dir1)
    assert(!new java.io.File(dir1, ".compact_tmp").exists())
    assert(spark.read.parquet(dir1).orderBy("id").collect().sameElements(before))

    // --- post-commit: marker written, old files partially deleted,
    //     staged files not yet moved -> recovery must finish the swap
    val dir2 = java.nio.file.Files.createTempDirectory("graft_rec2").toString
    spark.range(0, 50).select($"id").coalesce(1).write.mode("append").parquet(dir2)
    spark.range(50, 100).select($"id").coalesce(1).write.mode("append").parquet(dir2)
    // stage the compacted replacement (same rows, one file)
    spark.read.parquet(dir2).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir2/.compact_tmp")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir2, ".compact_commit"), "testrun1")
    // simulate the crash: one old file already deleted, one still present
    val oldFiles = new java.io.File(dir2).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    oldFiles.head.delete()
    Maintenance.recover(spark, dir2)
    val files = new java.io.File(dir2).listFiles().filter(_.isFile).map(_.getName)
    assert(files.count(_.endsWith(".parquet")) == 1)
    assert(files.filter(_.endsWith(".parquet")).forall(_.startsWith("compact-testrun1-")))
    assert(!new java.io.File(dir2, ".compact_commit").exists())
    assert(spark.read.parquet(dir2).count() == 100)
  }

  test("cluster-by compaction produces disjoint per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    // keys deliberately interleaved across input files
    (0 to 9).foreach { i =>
      spark.range(0, 1000)
        .select(($"id" * 10 + i).as("ts_key"), lit(i).as("src"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    Maintenance.compact(spark, dir, targetBytes = 40L * 1024,
      clusterBy = Seq("ts_key"))
    // per-file min/max must not overlap -> a ts_key filter can skip files
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), $"ts_key")
      .groupBy("f").agg(min("ts_key").as("lo"), max("ts_key").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perFile.length > 1, "expected multiple output files")
    val sorted = perFile.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._2, s"overlap: $a vs $b")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("zorder compaction keeps BOTH dimensions tight per file; x-sort does not") {
    // 256x256 grid, both dims uniform and independent — the adversarial
    // case for single-column clustering
    def freshGrid(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
      spark.range(0, 65536)
        .select(($"id" % 256).as("x"), expr("id div 256").as("y"))
        .repartition(8).write.mode("overwrite").parquet(dir)
      dir
    }
    def avgSpan(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
        .collect().map(_.getDouble(1))
      spans.sum / spans.length
    }
    val zDir = freshGrid()
    // small targetBytes -> 16 output files
    val (_, nz) = Maintenance.compact(spark, zDir,
      targetBytes = 20L * 1024, zorderBy = Some(("x", "y")))
    assert(nz >= 8, s"expected a multi-file z-layout, got $nz")
    val xDir = freshGrid()
    Maintenance.compact(spark, xDir, targetBytes = 20L * 1024,
      clusterBy = Seq("x"))
    // z-order: every file is a curve segment, tight in both dims;
    // x-sort: x tight but y spans ~the whole domain in every file.
    // Margins are generous on purpose: repartitionByRange picks bounds by
    // sampling with an rdd-id-derived seed, so exact per-file spans vary
    // run to run (a boundary file straddling a quadrant crossing can span
    // a whole dim); only the averaged contrast is stable.
    assert(avgSpan(zDir, "x") < 0.7 * 255, s"z x-span ${avgSpan(zDir, "x")}")
    assert(avgSpan(zDir, "y") < 0.7 * 255, s"z y-span ${avgSpan(zDir, "y")}")
    assert(avgSpan(xDir, "y") > 0.9 * 255, s"xsort y-span ${avgSpan(xDir, "y")}")
    assert(avgSpan(zDir, "y") < 0.8 * avgSpan(xDir, "y"))
    // layout changes nothing about the data
    assert(spark.read.parquet(zDir).agg(sum($"x" + $"y" * 256)).first.getLong(0) ==
      (0L until 65536L).sum)
  }
}
