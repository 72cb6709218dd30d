package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows (incl. skewed key)") {
    // key 1 is hot: 1000 rows
    val big = ((1 to 1000).map(i => (1L, s"v$i")) ++ Seq((2L, "x"), (3L, "y")))
      .toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val salted = ScaleJoins.saltedJoin(big, small, Seq("k"), factor = 4)
      .select("k", "payload", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    assert(salted.count() == 1001)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt actually spreads the hot key
    val saltSpread = big.withColumn("_salt",
        pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(4)).cast("int"))
      .filter($"k" === 1).select("_salt").distinct().count()
    assert(saltSpread > 1)
  }

  test("salted join rejects join types where unmatched small rows leak") {
    val big = Seq((1L, "x")).toDF("k", "payload")
    val small = Seq((1L, "one")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      ScaleJoins.saltedJoin(big, small, Seq("k"), factor = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      ScaleJoins.saltedJoin(big, small, Seq("k"), factor = 4, joinType = "full_outer")
    }
    // left outer IS salt-safe: unmatched BIG rows carry one salt each
    val left = ScaleJoins.saltedJoin(
      big.unionByName(Seq((9L, "none")).toDF("k", "payload")),
      small, Seq("k"), factor = 4, joinType = "left")
    assert(left.count() == 2)
    assert(left.filter($"k" === 9 && $"name".isNull).count() == 1)
  }

  private def dropManaged(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("bucketed tables join without a shuffle on the join key") {
    Seq("bkt_left", "bkt_right").foreach(dropManaged)
    spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("a"))
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable("bkt_left")
    spark.range(0, 1000).select($"id".as("k"), ($"id" % 5).as("b"))
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable("bkt_right")
    // tiny test tables would broadcast (bucketing moot); force the
    // shuffle-join path the pattern exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"))
      assert(!plan.contains("Exchange hashpartitioning(k"))
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE bkt_left")
    spark.sql("DROP TABLE bkt_right")
  }
}
