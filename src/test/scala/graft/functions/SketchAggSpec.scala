package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{Dedup, Hashing, Sketches}

class SketchAggSpec extends SparkSpec {
  import spark.implicits._

  test("graft_cms is total over raw 60-bit hashes (masks internally)") {
    // KmvAgg accepts raw md5Long output, so graft_cms must too: unmasked,
    // pa(d)*h overflows Long and Java % keeps the sign — without the
    // internal mask this was an executor ArrayIndexOutOfBoundsException
    val df = (1 to 200).map(i => s"key-$i").toDF("k")
    val raw = df.agg(Sketches.cms(Hashing.md5Long($"k"), 3, 64).as("sk")).first()
    val masked = df.agg(Sketches.cms(
      Hashing.md5Long($"k").bitwiseAND(lit(Dedup.HashMask)), 3, 64).as("sk")).first()
    assert(raw.getSeq[Long](0) == masked.getSeq[Long](0))
    assert(raw.getSeq[Long](0).sum == 3L * 200)
  }

  test("histogram quantiles stay within one bucket width of exact percentiles") {
    val sf = "/root/testdata/sf0.001"
    val est = graft.queries.SketchOps.approxQuantiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val cents = expr("cast(round(l_extendedprice * 100) as long)")
    val li = graft.core.Tables.lineitem(spark, sf).select(col("l_returnflag"), cents.as("c"))
    val r = li.agg(min($"c"), max($"c")).first()
    val bucketDollars = (r.getLong(1) - r.getLong(0) + 1) / 256.0 / 100.0
    // the sketch targets the rank-ceil(q*n) ORDER STATISTIC (not an
    // interpolated percentile); against that its upper-edge estimate is
    // bounded above by exactly one bucket width and never undershoots
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"c")
    val ranked = li
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"l_returnflag")))
    val exact = Seq(50, 95, 99).map { pct =>
      pct -> ranked.filter(expr(s"rn = (n * $pct + 99) div 100"))
        .collect().map(r => r.getString(0) -> r.getLong(1) / 100.0).toMap
    }.toMap
    est.foreach { case (k, (a50, a95, a99)) =>
      assert(a50 <= a95 && a95 <= a99)
      Seq((a50, exact(50)(k)), (a95, exact(95)(k)), (a99, exact(99)(k))).foreach {
        case (a, e) =>
          assert(a >= e - 0.01 && a - e <= bucketDollars + 0.02,
            s"group $k: approx $a vs order-stat $e (bucket width $bucketDollars)")
      }
    }
  }

  test("cmsEstimate upper-bounds exact counts for any input masking") {
    val rows = (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(s"t$i")).toDF("k")
    val sk = rows.agg(Sketches.cms(Hashing.md5Long($"k"), 3, 32).as("sk"))
    val est = rows.groupBy($"k").agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(sk))
      .withColumn("n_cms",
        Sketches.cmsEstimate($"sk", Hashing.md5Long($"k"), 3, 32))
      .select($"n_exact", $"n_cms").collect()
    est.foreach(r => assert(r.getLong(1) >= r.getLong(0),
      s"estimate ${r.getLong(1)} under exact ${r.getLong(0)}"))
  }
}
