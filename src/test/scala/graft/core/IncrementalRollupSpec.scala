package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalRollupSpec extends SparkSpec {

  test("three incremental batches equal one full recompute, any arrival order") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.orders(spark, sf)
      .withColumn("yr", year(col("o_orderdate")))
    val batches = Seq(
      orders.filter(col("yr") <= 1996),
      orders.filter(col("yr").between(1997, 1998)),
      orders.filter(col("yr") >= 1999))
    // sanity: batches partition the table
    assert(batches.map(_.count()).sum == orders.count())

    def run(order: Seq[Int]): org.apache.spark.sql.DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory("graft_roll").toString
      order.foreach(i => IncrementalRollup.update(
        spark, dir, batches(i), Seq("o_orderpriority"), "o_totalprice"))
      IncrementalRollup.result(spark, dir)
        .select("o_orderpriority", "cnt", "sum_value", "avg_value", "min_value", "max_value")
    }
    val fwd = run(Seq(0, 1, 2))
    val rev = run(Seq(2, 0, 1))

    val full = orders.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_value"),
        round((sum(round(col("o_totalprice") * 100).cast("long")).cast("double") /
          count(lit(1))) / 100.0, 6).as("avg_value"),
        (min(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0)
          .as("min_value"),
        (max(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0)
          .as("max_value"))
      .select("o_orderpriority", "cnt", "sum_value", "avg_value", "min_value", "max_value")

    assert(fwd.exceptAll(full).isEmpty && full.exceptAll(fwd).isEmpty)
    assert(rev.exceptAll(full).isEmpty && full.exceptAll(rev).isEmpty)
  }

  test("crash-torn partial version is ignored; next update heals it") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.orders(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_roll3").toString
    IncrementalRollup.update(spark, dir, orders.filter(col("o_orderkey") % 2 === 0),
      Seq("o_orderstatus"), "o_totalprice")
    val afterV1 = IncrementalRollup.result(spark, dir).collect().toSet
    // simulate a crash mid-write of v=2: directory with data but NO _SUCCESS
    val torn = new java.io.File(dir, "v=00000002")
    torn.mkdirs()
    java.nio.file.Files.writeString(
      torn.toPath.resolve("part-junk.parquet"), "not a parquet file")
    // reader still serves v=1
    assert(IncrementalRollup.result(spark, dir).collect().toSet == afterV1)
    // next update overwrites the torn v=2 and completes
    IncrementalRollup.update(spark, dir, orders.filter(col("o_orderkey") % 2 === 1),
      Seq("o_orderstatus"), "o_totalprice")
    val fullDirect = IncrementalRollup.partial(orders, Seq("o_orderstatus"), "o_totalprice")
      .collect().length
    assert(IncrementalRollup.result(spark, dir).collect().length == fullDirect)
    // superseded v=1 got garbage-collected
    assert(!new java.io.File(dir, "v=00000001").exists())
  }

  test("KMV sketch state: batch-merged approx_distinct equals one-shot sketch") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.orders(spark, sf)
    def run(order: Seq[Int]): Map[String, Long] = {
      val batches = Seq(
        orders.filter(col("o_orderkey") % 3 === 0),
        orders.filter(col("o_orderkey") % 3 === 1),
        orders.filter(col("o_orderkey") % 3 === 2))
      val dir = java.nio.file.Files.createTempDirectory("graft_rollk").toString
      order.foreach(i => IncrementalRollup.update(spark, dir, batches(i),
        Seq("o_orderpriority"), "o_totalprice", distinctCol = Some("o_custkey")))
      IncrementalRollup.result(spark, dir)
        .select("o_orderpriority", "approx_distinct")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val fwd = run(Seq(0, 1, 2))
    val rev = run(Seq(2, 1, 0))
    // one-shot sketch over the full table = the merged state's answer
    val oneShot = IncrementalRollup.partial(orders, Seq("o_orderpriority"),
        "o_totalprice", Some("o_custkey"))
      .select(col("o_orderpriority"),
        graft.ops.Sketches.kmvEstimate(col("kmv"), IncrementalRollup.KmvK).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fwd == oneShot && rev == oneShot)
    // and the estimate tracks the exact distinct count
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val est = fwd(k)
      assert(math.abs(est - ex) <= math.max(3.0, 0.15 * ex),
        s"group $k: estimate $est vs exact $ex")
    }
  }

  test("histogram state: batch-merged quantiles equal one-shot; bounds are pinned") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.orders(spark, sf)
      .withColumn("yr", year(col("o_orderdate")))
    val bounds = Some((0L, 60000000L)) // 0..600k dollars in cents
    val batches = Seq(orders.filter(col("yr") <= 1997), orders.filter(col("yr") > 1997))
    val dir = java.nio.file.Files.createTempDirectory("graft_hroll").toString
    batches.foreach(b => IncrementalRollup.update(spark, dir, b,
      Seq("o_orderpriority"), "o_totalprice", histBounds = bounds))
    val merged = IncrementalRollup.result(spark, dir)
      .select("o_orderpriority", "p50", "p95", "p99")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

    // one-shot: a single-batch rollup over everything
    val oneDir = java.nio.file.Files.createTempDirectory("graft_hroll1").toString
    IncrementalRollup.update(spark, oneDir, orders,
      Seq("o_orderpriority"), "o_totalprice", histBounds = bounds)
    val oneShot = IncrementalRollup.result(spark, oneDir)
      .select("o_orderpriority", "p50", "p95", "p99")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(merged == oneShot)
    // sanity: estimates track the exact interpolation-free percentiles to
    // within one bucket (span/128 cents)
    val bucketDollars = 60000000L / 128 / 100.0
    val exact = orders.groupBy("o_orderpriority")
      .agg(expr("percentile(cast(round(o_totalprice*100) as long), 0.5)").as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1) / 100.0).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(merged(k)._1 - e) <= 2 * bucketDollars,
        s"$k: p50 ${merged(k)._1} vs ~exact $e")
    }
    // changing the bucket grid mid-life is refused
    intercept[IllegalStateException] {
      IncrementalRollup.update(spark, dir, batches.head,
        Seq("o_orderpriority"), "o_totalprice",
        histBounds = Some((0L, 1000L)))
    }
    // null group keys and null values survive the histogram path: the
    // null-key group keeps its base aggregates, null values just carry no
    // quantile information
    val nullsDir = java.nio.file.Files.createTempDirectory("graft_hrolln").toString
    val withNulls = orders.limit(200)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 5 === 0, lit(null: String))
          .otherwise(col("o_orderpriority")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, lit(null: java.lang.Double))
          .otherwise(col("o_totalprice")))
    IncrementalRollup.update(spark, nullsDir, withNulls,
      Seq("o_orderpriority"), "o_totalprice", histBounds = bounds)
    val st = IncrementalRollup.result(spark, nullsDir)
    assert(st.filter(col("o_orderpriority").isNull).count() == 1)
    val expectNullGroup = withNulls.filter(col("o_orderpriority").isNull).count()
    assert(st.filter(col("o_orderpriority").isNull).head.getAs[Long]("cnt")
      == expectNullGroup)
    // dropping the histogram is a clean downgrade
    IncrementalRollup.update(spark, dir, batches.head.limit(10),
      Seq("o_orderpriority"), "o_totalprice")
    assert(!IncrementalRollup.result(spark, dir).columns.contains("p50"))
  }

  test("distinctCol config changes: dropping the sketch migrates, adding fails fast") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.orders(spark, sf)
    // state built WITH the sketch, then maintained without: clean downgrade
    val downDir = java.nio.file.Files.createTempDirectory("graft_mig1").toString
    IncrementalRollup.update(spark, downDir, orders.limit(100),
      Seq("o_orderstatus"), "o_totalprice", distinctCol = Some("o_custkey"))
    IncrementalRollup.update(spark, downDir, orders.limit(50),
      Seq("o_orderstatus"), "o_totalprice", distinctCol = None)
    assert(!IncrementalRollup.result(spark, downDir)
      .columns.contains("approx_distinct"))
    // state built WITHOUT the sketch: adding one can't recover history's
    // hashes — must fail with the rebuild instruction, not corrupt state
    val upDir = java.nio.file.Files.createTempDirectory("graft_mig2").toString
    IncrementalRollup.update(spark, upDir, orders.limit(100),
      Seq("o_orderstatus"), "o_totalprice")
    val e = intercept[IllegalStateException] {
      IncrementalRollup.update(spark, upDir, orders.limit(50),
        Seq("o_orderstatus"), "o_totalprice", distinctCol = Some("o_custkey"))
    }
    assert(e.getMessage.contains("replay"))
  }

  test("updating with an empty batch is a no-op") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.orders(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_roll2").toString
    IncrementalRollup.update(spark, dir, orders, Seq("o_orderstatus"), "o_totalprice")
    val before = IncrementalRollup.result(spark, dir).collect().toSet
    IncrementalRollup.update(spark, dir, orders.limit(0), Seq("o_orderstatus"), "o_totalprice")
    val after = IncrementalRollup.result(spark, dir).collect().toSet
    assert(before == after)
  }
}
