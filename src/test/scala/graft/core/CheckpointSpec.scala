package graft.core

import graft.SparkSpec
import org.apache.spark.sql.execution.LogicalRDD

class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def isTruncated(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectLeaves().forall(_.isInstanceOf[LogicalRDD])

  test("default mode truncates lineage via localCheckpoint") {
    val df = Seq(1, 2, 3).toDF("x").filter($"x" > 1).groupBy().sum("x")
    val cp = Checkpoint(df)
    assert(isTruncated(cp), cp.queryExecution.analyzed.toString)
    assert(cp.as[Long].head == 5L)
  }

  test("spark.graft.checkpoint.dir switches to reliable checkpoint files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpoint.DirConf, dir)
    try {
      val df = Seq((1, "a"), (2, "b")).toDF("k", "v").filter($"k" > 0)
      val cp = Checkpoint(df)
      assert(isTruncated(cp), cp.queryExecution.analyzed.toString)
      assert(cp.count() == 2)
      // reliable mode writes RDD blocks under the configured dir — the
      // property that survives executor loss (localCheckpoint writes none)
      val files = java.nio.file.Files.walk(java.nio.file.Path.of(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset(Checkpoint.DirConf)
  }

  test("iterative connected components is correct under reliable checkpointing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_cc").toString
    spark.conf.set(Checkpoint.DirConf, dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      val comps = graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally spark.conf.unset(Checkpoint.DirConf)
  }
}
