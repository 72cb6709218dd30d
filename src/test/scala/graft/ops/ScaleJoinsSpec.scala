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

  test("skewSafeJoin: partial salting — hot keys spread, cold keys untouched") {
    // key 1 is hot (1000 rows), keys 2..40 are cold (1 row each)
    val big = ((1 to 1000).map(i => (1L, s"v$i")) ++
      (2 to 40).map(i => (i.toLong, s"c$i"))).toDF("k", "payload")
    val small = (1 to 50).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    val (saltedBig, explodedSmall) =
      ScaleJoins.skewSaltedSides(big, small, Seq("k"), factor = 8, hotMinRows = 100)
    // the hot key's rows spread across many salts; EVERY cold key keeps salt 0
    assert(saltedBig.filter($"k" === 1).select("_salt").distinct().count() > 4)
    assert(saltedBig.filter($"k" =!= 1).select("_salt").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(0))
    // small-side replication is |hot| * (factor-1) extra rows, not |small| * factor
    assert(explodedSmall.count() == 50 + 7)
    assert(explodedSmall.filter($"k" === 1).count() == 8)
    // result equivalence incl. left-join null extension on unmatched big keys
    val bigL = big.unionByName(Seq((99L, "none")).toDF("k", "payload"))
    val safe = ScaleJoins.skewSafeJoin(bigL, small, Seq("k"),
      factor = 8, hotMinRows = 100, joinType = "left")
      .select("k", "payload", "name")
    val plain = bigL.join(small, Seq("k"), "left").select("k", "payload", "name")
    assert(safe.exceptAll(plain).isEmpty && plain.exceptAll(safe).isEmpty)
    // the join's shuffle key includes the salt: the exchange the hot key
    // spreads across is hashpartitioning(k, _salt)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = saltedBig.join(explodedSmall, Seq("k", "_salt"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(k") && plan.contains("_salt"),
        s"salted exchange missing:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
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
