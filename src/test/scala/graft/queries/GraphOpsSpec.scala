package graft.queries

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  test("pagerank iterations broadcast the rank side; edges are never re-shuffled") {
    // one un-checkpointed iteration step (the query's localCheckpoint
    // hides the loop plan): the edges⋈contrib join must be broadcast —
    // a SortMergeJoin there would shuffle the O(edges) side every round
    val (e, deg) = GraphOps.tradingGraph(spark, "/root/testdata/sf0.001")
    val plan = GraphOps.iterate(e, deg, GraphOps.initialRank(deg))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"edge re-shuffle detected:\n$plan")
    assert(plan.contains("partial_sum"), s"no map-side combine:\n$plan")
  }

  test("integer pagerank is bit-identical under different partitioning") {
    // the claim the micro-unit arithmetic makes: shuffle/merge order cannot
    // perturb ranks, so any partitioning yields the same bytes
    val sf = "/root/testdata/sf0.001"
    val base = GraphOps.pagerank(spark, sf).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val other = GraphOps.pagerank(spark, sf).collect().toSeq
      assert(base == other)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(base.size == 25)
    // ranks are positive and sorted desc with node tie-break
    val ranks = base.map(_.getLong(1))
    assert(ranks == ranks.sorted.reverse && ranks.forall(_ > 0))
    // suppliers aggregate many customers' mass -> the head of the ranking
    // on this bipartite graph must contain supplier nodes
    assert(base.take(5).exists(_.getString(0).startsWith("s")))
  }
}
