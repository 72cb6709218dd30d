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
