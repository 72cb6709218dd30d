package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainPrepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("class upsample: n_after = n_before * factor; majority class factor is 1") {
    val rows = TrainPrepOps.classUpsample(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * r.getLong(2), s"replication broken: $r")
    }
    val majority = rows.maxBy(_.getLong(1))
    assert(majority.getLong(2) == 1, s"majority class must not be replicated: $majority")
    // rebalance direction: after upsampling, the smallest class is within
    // 2x of the majority (integer factors can't do better than floor)
    val after = rows.map(_.getLong(3))
    assert(after.max <= 2 * after.min, after.mkString(","))
  }

  test("target encoding never leaks the row's own target") {
    // leave-one-out: for a category whose docs all share one length L the
    // encoding is exactly L; in general enc must lie inside the category's
    // OTHER-docs length range — verified via min/max per source
    val docs = graft.core.Tables.documents(spark, sf)
    val bounds = docs.groupBy(col("source"))
      .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    TrainPrepOps.targetEncode(spark, sf).collect().foreach { r =>
      val (lo, hi, n) = bounds(r.getString(0))
      assert(n > 1)
      assert(r.getDouble(2) >= lo - 0.5 && r.getDouble(3) <= hi + 0.5,
        s"encoding escaped the category's value range: $r vs [$lo,$hi]")
    }
  }
}
