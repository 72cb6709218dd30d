package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Hashing

/** Bloom filter aggregate + probe: the no-false-negative guarantee the
  * semi-join rewrite rests on, the false-positive rate the m/k sizing
  * promises, partition-invariance of the OR-merge, and the plan shape
  * (probe fused into the fact scan before any exchange).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 14 // 16384 bits
  private val K = 5

  private def bloomOf(keys: Seq[Long], parts: Int) =
    keys.toDF("key").repartition(parts)
      .agg(call_function("graft_bloom",
        Hashing.fastLong(col("key")), lit(M), lit(K)).as("bits"))

  test("no false negatives: every inserted key probes true") {
    val keys = (1L to 1000L).map(_ * 7919)
    val bloom = bloomOf(keys, 8)
    val misses = keys.toDF("key").crossJoin(bloom)
      .filter(!call_function("graft_bloom_probe",
        col("bits"), Hashing.fastLong(col("key")), lit(K)))
      .count()
    assert(misses == 0)
  }

  test("false-positive rate is near the design rate for the sizing") {
    val keys = (1L to 1000L).map(_ * 7919)
    val bloom = bloomOf(keys, 4)
    val absent = (1L to 20000L).map(_ * 7919 + 3) // disjoint from keys
    val fps = absent.toDF("key").crossJoin(bloom)
      .filter(call_function("graft_bloom_probe",
        col("bits"), Hashing.fastLong(col("key")), lit(K)))
      .count()
    // n=1000, m=16384, k=5 -> theoretical fpp ~0.05%; allow 10x slack
    assert(fps.toDouble / absent.size < 0.005, s"fp rate ${fps.toDouble / absent.size}")
  }

  test("merge is partition-invariant: same bits at any parallelism") {
    val keys = (1L to 500L).map(_ * 31)
    val one = bloomOf(keys, 1).as[Seq[Long]].head()
    val many = bloomOf(keys, 16).as[Seq[Long]].head()
    assert(one == many)
  }

  test("probe runs scan-side: filter sits below the semi join's exchange") {
    val plan = graft.queries.ScaleOps.bloomSemiJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_probe"), plan)
    // the probe filter must appear BELOW (after, in top-down print) the
    // semi join: rows die at the scan, not post-shuffle
    val probeIdx = plan.indexOf("graft_bloom_probe")
    val semiIdx = plan.indexOf("LeftSemi")
    assert(semiIdx > 0 && semiIdx < probeIdx, s"semi=$semiIdx probe=$probeIdx")
    // and it reaches the fact scan itself as a data filter
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("lineitem")).getOrElse("")
    assert(scanLine.contains("graft_bloom_probe"), scanLine)
  }
}
