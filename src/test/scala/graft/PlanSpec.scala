package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions: the properties that decide 100 TB viability —
  * filters reaching the parquet scan, column pruning, broadcast selection,
  * partial aggregation, top-k never globally sorting — checked as tests so
  * a regression in plan shape fails CI, not a cluster bill.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter predicates push down to the parquet scan") {
    val plan = executed(
      graft.core.Tables.lineitem(spark, sf)
        .filter(col("l_quantity") < 10 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_quantity")))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("LessThan(l_quantity,10.0)"), plan.linesIterator.find(_.contains("PushedFilters")).getOrElse(""))
    assert(plan.contains("EqualTo(l_returnflag,R)"))
  }

  test("column pruning: scan reads only referenced columns") {
    val plan = executed(
      graft.core.Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q")))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"))
  }

  test("small dimension joins broadcast; no shuffle exchange on the join key") {
    val plan = executed(graft.queries.Relational.joinRevenueByNation(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("group-by aggregates partially aggregate before the exchange") {
    val plan = executed(graft.queries.Relational.aggLineitem(spark, sf))
    val partialIdx = plan.indexOf("partial_sum")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(partialIdx > 0 && exchangeIdx > 0)
    // plan prints top-down: the final agg/exchange appear BEFORE (above) the
    // partial agg, i.e. partial runs upstream (map-side) of the shuffle
    assert(exchangeIdx < partialIdx)
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = executed(graft.queries.Relational.topkParts(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("text scoring is scan-side: no shuffle before the presentation sort") {
    // (HOF lambdas evaluate interpreted — not codegen'd — but the whole
    // scoring pipeline is still a single Project over the scan: the only
    // Exchange in the plan is the final ORDER BY's range partitioning.)
    val plan = executed(graft.queries.TextOps.textStats(spark, sf))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"), exchanges)
    assert(!plan.contains("hashpartitioning"))
  }

  test("partitioned read prunes to the selected partition only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune").toString
    graft.core.Tables.events(spark, sf)
      .withColumn("_p", when(col("event_id") % 2 === 0, "a").otherwise("b"))
      .write.mode("overwrite").partitionBy("_p").parquet(tmp)
    val plan = executed(spark.read.parquet(tmp).filter(col("_p") === "a"))
    val partLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(partLine.contains("_p"), partLine)
    // data filters empty: the partition column never becomes a row filter
    assert(!plan.contains("Filter (_p"))
  }

  test("runtime bloom filter prunes the big side of a selective shuffle join") {
    // The 100 TB shuffle-join reducer: a selective filter on one join side
    // makes Catalyst build a bloom filter over its join keys and push a
    // bloom_filter_might_contain probe into the OTHER side's scan, so
    // non-matching fact rows die before the exchange instead of shuffling.
    // Thresholds are sized for clusters; lower them to show the rewrite on
    // test data, and force a shuffle join (broadcast joins don't need it).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.core.Tables.lineitem(spark, sf)
      val ord = graft.core.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloom"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the rewrite preserves results vs the plain join
      val expect = li.join(ord.hint("broadcast"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      assert(joined.collect().toSeq == expect.collect().toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("embedding dedup joins on LSH bucket keys, never a block cartesian") {
    // the 100 TB guarantee for q_dedup_embedding: candidate generation is a
    // (band, bucket, block) equi-join — a same-label cartesian (the naive
    // form's plan) would be 10¹⁴ pairs on a 10⁷-row block
    val plan = executed(graft.queries.DedupOps.dedupEmbedding(spark, sf))
    assert(!plan.contains("CartesianProduct"), "cartesian in plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in plan")
    // the candidate join's key set includes the bucket columns
    assert(plan.contains("band") && plan.contains("bucket"), "no bucket keys in plan")
  }

  test("semantic dedup pairs only within a cluster: equi-join on the cluster id") {
    // SemDeDup's 100 TB guarantee: the pair stage is an equi-join keyed on
    // cent_id (cluster blocking — O(N²/k), one shuffle), never an
    // all-pairs cartesian. The single nested-loop in the plan is the
    // k-row centroid broadcast for assignment, which is constant-sized.
    val plan = executed(graft.queries.DedupOps.semDedup(spark, sf))
    assert(!plan.contains("CartesianProduct"), "cartesian in plan")
    assert(plan.contains("cent_id"), "no cluster-id join key in plan")
    // the assignment subtree (holding the one centroid nested-loop) is
    // printed once per consumer (pair-a, pair-b, member census), so count
    // DISTINCT nested-loop shapes, not occurrences — and all must be the
    // broadcast Cross form (constant k-row build side), never a plain BNLJ
    // standing in for the pair join
    val nestedLoops = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(nestedLoops.forall(_.contains("Cross")),
      s"non-cross nested-loop join in plan: $nestedLoops")
  }

  test("histogram-quantile bucketing partially aggregates before its one exchange") {
    // the sketch's scale claim: ONE shuffle of ≤ groups×buckets rows; the
    // bucket counting must combine map-side
    val plan = executed(graft.queries.SketchOps
      .approxQuantiles(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
  }

  test("approx sketches track exact answers within tolerance (the 100TB path)") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).first.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02)).first.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
    val exactMedian = li.select(expr("percentile(l_extendedprice, 0.5)")).first.getDouble(0)
    val approxMedian = li.select(expr("percentile_approx(l_extendedprice, 0.5, 1000)"))
      .first.getDouble(0)
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.05)
  }

  test("oov vocabulary is a broadcast top-k; the token stream never shuffle-joins") {
    val plan = executed(graft.queries.TextOps.oovRate(spark, sf))
    // vocab selection: two-phase top-k, not a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(5).mkString("\n"))
    // membership probe: KB-sized vocab broadcasts into the anti join;
    // a SortMergeJoin here would shuffle the corpus-sized token stream
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), "token stream shuffle-joined")
  }

  test("dpp join: the fact scan carries a runtime dynamic-pruning partition filter") {
    // q_dpp_join's 100 TB guarantee: the year filter lives on the dim
    // side, so only DYNAMIC partition pruning can keep the fact scan from
    // reading every year directory — the scan's PartitionFilters must
    // contain the runtime dynamicpruning subquery fed by the dim's
    // broadcast exchange.
    // size-based benefit estimation says "don't bother" on KB test data;
    // disable stats-based estimation so the rewrite itself is what's
    // under test (at real fact sizes the stats path reaches the same
    // decision)
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = graft.queries.ScaleOps.dppJoin(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n${plan.take(3000)}")
      assert(df.collect().nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("custom DSv2 fixed-width scan: filter pushed into the source, columns pruned") {
    val dir = graft.queries.Scratch.dir("plan_fixedwidth_dsv2")
    graft.core.Tables.supplier(spark, sf)
      .select(concat(
        lpad(col("s_suppkey").cast("string"), 10, "0"),
        lpad(col("s_nationkey").cast("string"), 5, "0"),
        lpad((graft.queries.Num.cents(col("s_acctbal")) + 1000000000L)
          .cast("string"), 15, "0")).as("value"))
      .coalesce(1).write.mode("overwrite").text(dir)
    val df = spark.read.format("graft.sources.FixedWidthSource")
      .option("path", dir)
      .option("fields",
        "s_suppkey:long:0:10,s_nationkey:int:10:5,cents_off:long:15:15")
      .load()
      .filter(col("s_nationkey") < 13)
      .select(col("s_suppkey"))
    val plan = executed(df)
    // the comparison filter reached the custom scan...
    assert(plan.contains("PushedFilters=[") && plan.contains("LessThan(s_nationkey,13)"),
      plan.take(2000))
    // ...and was CONSUMED there: no post-scan Filter node re-applies it
    assert(!plan.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") || l.trim.startsWith("Filter")), plan.take(2000))
    // column pruning: the scan's output schema is just the projected field
    assert(plan.contains("fields=s_suppkey") || plan.contains("ReadSchema: struct<s_suppkey:bigint>"),
      plan.take(2000))
    // and the source agrees with the text+substring formulation
    val viaText = spark.read.text(dir)
      .select(substring(col("value"), 1, 10).cast("long").as("s_suppkey"),
        substring(col("value"), 11, 5).cast("int").as("s_nationkey"))
      .filter(col("s_nationkey") < 13).select(col("s_suppkey"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      viaText.collect().map(_.getLong(0)).sorted.toSeq)
  }
}
