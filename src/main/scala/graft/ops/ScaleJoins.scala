package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join strategies for 100 TB-scale shuffles, usable when AQE's automatic
  * skew splitting / broadcast promotion isn't enough:
  *
  *  - [[saltedJoin]]: deterministic key salting — a hot key's rows spread
  *    across `factor` shuffle partitions; the small side replicates per
  *    salt. The classic fix when one key holds >> 1/partitions of the data.
  *  - bucketed co-located joins: both tables written `bucketBy` the join
  *    key, so the join reads pre-shuffled buckets and needs NO exchange
  *    (see queries.ScaleOps.bucketedJoin for the end-to-end shape).
  */
object ScaleJoins {

  /** Equi-join with the big/skewed side salted. The salt is a deterministic
    * hash of the big side's full row (stable across retries/layouts —
    * nondeterministic salts break speculative execution and result
    * reproducibility); the small side explodes across all `factor` salts.
    * Result set is identical to the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // right/full outer would surface the small side's factor-1 unmatched
    // salted copies as spurious null-extended rows — only joins where
    // unmatched SMALL rows never appear in the output are salt-safe
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int"))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(explodedSmall, keys :+ "_salt", joinType).drop("_salt")
  }
}
