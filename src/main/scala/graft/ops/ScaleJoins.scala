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

  /** PARTIAL salting, census-driven: diagnose the big side's hot keys and
    * salt ONLY those — the remediation wired to the diagnosis
    * (queries.ScaleOps.skewDiagnosis is the standalone report of the same
    * census). Blanket salting ([[saltedJoin]]) replicates the small side
    * `factor`× for EVERY key; here the replication cost is
    * |hot keys| × (factor−1) extra rows — negligible by construction —
    * while cold keys join exactly as they would unsalted (salt 0 on both
    * sides).
    *
    * Mechanics, fully distributed (no driver collect):
    *  1. census: one partial-aggregated count over the big side's join
    *     keys, filtered to keys holding ≥ `hotMinRows` rows. At most
    *     |big| / hotMinRows keys can pass, so the hot set is bounded and
    *     broadcastable BY CONSTRUCTION (set hotMinRows ≈ the rows one
    *     shuffle partition handles comfortably; keys under it don't need
    *     salting, keys over it are few).
    *  2. both sides broadcast-join the hot set as a flag — scan-side work.
    *  3. hot big rows get a deterministic row-hash salt in [0, factor);
    *     cold rows salt 0. Hot small rows explode across all salts; cold
    *     small rows keep the single salt 0.
    *  4. one equi-join on keys :+ _salt — the hot keys' rows now spread
    *     over `factor` shuffle partitions; everything else lands exactly
    *     where the unsalted join would put it.
    * Result set is identical to the unsalted join (oracle-gated as
    * q_skew_safe_join over a deliberately skewed fixture).
    */
  def skewSafeJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                   factor: Int, hotMinRows: Long,
                   joinType: String = "inner"): DataFrame = {
    val (saltedBig, explodedSmall) =
      skewSaltedSides(big, small, keys, factor, hotMinRows)
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase),
      s"skewSafeJoin supports inner/left/left_semi/left_anti, got $joinType")
    saltedBig.join(explodedSmall, keys :+ "_salt", joinType).drop("_salt")
  }

  /** The two salted inputs of [[skewSafeJoin]], exposed so specs can
    * assert the partial-salting property directly: hot keys carry many
    * distinct salts, cold keys exactly one.
    */
  private[graft] def skewSaltedSides(big: DataFrame, small: DataFrame,
                                     keys: Seq[String], factor: Int,
                                     hotMinRows: Long): (DataFrame, DataFrame) = {
    require(factor > 0, "salt factor must be positive")
    require(hotMinRows > 0, "hot-key threshold must be positive")
    val hot = big.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= hotMinRows)
      .select(keys.map(col) :+ lit(true).as("_hot"): _*)
    val saltedBig = big.join(broadcast(hot), keys, "left")
      .withColumn("_salt",
        when(col("_hot").isNotNull,
          pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int"))
          .otherwise(lit(0)))
      .drop("_hot")
    val explodedSmall = small.join(broadcast(hot), keys, "left")
      .withColumn("_salt",
        explode(when(col("_hot").isNotNull, sequence(lit(0), lit(factor - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      .drop("_hot")
    (saltedBig, explodedSmall)
  }
}
