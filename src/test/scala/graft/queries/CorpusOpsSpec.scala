package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("domain cap keeps at most the quota per source, lowest doc_ids first") {
    val rows = CorpusOps.domainCap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == math.min(total, 20L), s"quota violated: $r")
    }
    // the kept set is the doc_id prefix: its max id can never exceed the
    // max id of the whole domain, and equals it only when nothing was cut
    val full = graft.core.Tables.documents(spark, sf)
      .groupBy(col("source")).agg(max(col("doc_id")).as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.filter(r => r.getLong(1) > 20).foreach { r =>
      assert(r.getLong(4) < full(r.getString(0)), s"cap not a prefix: $r")
    }
  }

  test("stratified sample takes exactly min(K, stratum size) per language") {
    val strata = graft.core.Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = CorpusOps.stratifiedSample(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == strata.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == math.min(strata(r.getString(0)), 50L), s"$r")
    }
  }

  test("stratified sample membership is invariant to partitioning") {
    val base = CorpusOps.stratifiedSample(spark, sf).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      assert(CorpusOps.stratifiedSample(spark, sf).collect().toSeq == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("repetition screen: verdict totals partition the corpus") {
    val rows = CorpusOps.repetitionFilter(spark, sf).collect()
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    val verdicts = rows.map(_.getString(1)).toSet
    assert(verdicts.contains("keep"))
    assert(verdicts.exists(_.startsWith("drop:")), s"thresholds cut nothing: $verdicts")
  }

  test("decontamination flags a strict subset and benchmark docs are excluded") {
    val rows = CorpusOps.decontaminate(spark, sf).collect()
    val nTrain = rows.map(_.getLong(1)).sum
    val nCont = rows.map(_.getLong(2)).sum
    val nAll = graft.core.Tables.documents(spark, sf).count()
    val nBench = graft.core.Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 === 0).count()
    assert(nTrain == nAll - nBench)
    assert(nCont > 0 && nCont < nTrain, s"degenerate contamination: $nCont/$nTrain")
  }

  test("decontamination probe broadcasts the benchmark side") {
    val plan = CorpusOps.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark probe is not a broadcast semi-join:\n$plan")
  }

  test("corr from exact moments matches corr() within float tolerance") {
    val rows = Analytics.corrMoments(spark, sf).collect()
    val ref = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), round(col("l_extendedprice"))).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val got = r.getDouble(2)
      assert(math.abs(got - ref(r.getString(0))) < 1e-6, s"$r vs ${ref(r.getString(0))}")
      assert(got >= -1.0 && got <= 1.0)
    }
  }
}
