package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

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
}
