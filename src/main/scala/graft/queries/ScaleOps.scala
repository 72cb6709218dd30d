package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.ScaleJoins

/** Scale-pattern joins, oracle-checked for result equivalence with their
  * naive forms: salting proves the skew rewrite changes nothing but the
  * shuffle layout; bucketing proves a co-located join (no exchange on the
  * join key) returns the plain join's results.
  */
object ScaleOps {

  type Q = (SparkSession, String) => DataFrame

  /** Skew-salted join (factor 8) orders ⋈ customer, rolled up per segment.
    * The oracle runs the UNSALTED join — hash-equality is the correctness
    * proof for the rewrite.
    */
  def saltedJoin: Q = (s, d) => {
    ScaleJoins.saltedJoin(
        Tables.orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"), factor = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        Num.moneySum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  val saltedJoinSql: String =
    s"""SELECT c_mktsegment, count(*) AS n_orders,
      |  ${Num.moneySumSql("o_totalprice")} AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Bucketed co-located join: both sides written `bucketBy(8, key)` +
    * sorted, then joined — the bucketed scan satisfies the join's
    * distribution requirement so there is NO shuffle exchange on the join
    * key (the 100 TB pattern for repeated fact⋈fact joins). Oracle = the
    * plain parquet join.
    */
  /** Drop a managed table AND its warehouse directory (a crashed prior
    * write can leave an orphan dir that fails the next CREATE).
    */
  private def dropManaged(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val p = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir") + "/" + name)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Write `df` as a bucketed table unless an identical-rowcount bucketed
    * copy already exists. Bucketing is a one-time LAYOUT cost amortized
    * over every later co-located join (the whole point of the technique);
    * re-laying it out per query would time the write, not the join. The
    * rowcount probe (a parquet metadata count) catches a different scale
    * factor or regenerated inputs; the seeded testdata is content-stable
    * at equal counts.
    */
  private def ensureBucketed(s: SparkSession, name: String, df: DataFrame,
                             buckets: Int, key: String): Unit = {
    val current = s.catalog.tableExists(name) &&
      (try s.table(name).count() == df.count() catch { case _: Exception => false })
    if (!current) {
      dropManaged(s, name)
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(name)
    }
  }

  def bucketedJoin: Q = (s, d) => {
    ensureBucketed(s, "graft_bkt_orders", Tables.orders(s, d), 8, "o_orderkey")
    ensureBucketed(s, "graft_bkt_lineitem",
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
      8, "l_orderkey")
    s.table("graft_bkt_lineitem")
      .join(s.table("graft_bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        Num.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  val bucketedJoinSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_lines,
      |  ${Num.moneySumSql("l_extendedprice")} AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------- bloom-filter join pruning

  private val BloomM = 1 << 17 // 131072 bits = 2048 words = 16 KB
  private val BloomK = 5
  private val BloomThresh = 450000.0

  /** Semi join reduced by an explicit Bloom filter: revenue of lineitems
    * belonging to high-value orders (~10% of orders). The filter is built
    * over the selective side's keys in one partial-aggregated pass
    * ([[graft.functions.BloomAgg]] — per-partition filters OR-merge), the
    * 16 KB bit array broadcasts, and `graft_bloom_probe` drops ~90% of
    * fact rows INSIDE the scan's codegen stage, before any exchange. The
    * exact semi join then removes the filter's false positives, so the
    * result is exactly the plain semi join — which is what the oracle
    * runs; hash-equality proves the rewrite changes nothing but where
    * rows die.
    *
    * SCALE: locally the 1.5k-key build side broadcasts anyway, but at
    * 100 TB the build side of a selective join is routinely too big to
    * broadcast-JOIN while its Bloom filter is still KBs — the filter
    * crosses the cluster even when the hash table can't, and the
    * sort-merge join that remains shuffles only surviving rows. Unlike
    * Spark's opportunistic runtime-filter injection, the aggregate is an
    * explicit mergeable value: it can persist in rollup state or table
    * metadata and prune tomorrow's scan.
    */
  def bloomSemiJoin: Q = (s, d) => {
    import graft.ops.Hashing
    val hi = Tables.orders(s, d)
      .filter(col("o_totalprice") > BloomThresh)
      .select(col("o_orderkey"))
    // the filter reaches the fact scan as a SCALAR SUBQUERY — the same
    // planning shape as Spark's own injected runtime filters: the bloom
    // build runs once as a subquery stage, and the probe is an ordinary
    // Filter on scan columns, which the optimizer keeps below the join.
    // (A crossJoin(broadcast(bloom)) formulation instead becomes a
    // BroadcastNestedLoopJoin CONDITION that Catalyst hoists above the
    // semi join — pruning after the join it was meant to protect.)
    hi.agg(call_function("graft_bloom",
        Hashing.fastLong(col("o_orderkey")), lit(BloomM), lit(BloomK)).as("bits"))
      .createOrReplaceTempView("graft_bloom_build")
    val pruned = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
      .filter(expr("graft_bloom_probe((SELECT bits FROM graft_bloom_build), " +
        s"xxhash64(l_orderkey), $BloomK)"))
    pruned
      .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        Num.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  val bloomSemiJoinSql: String =
    s"""SELECT l_returnflag, count(*) AS n_lines,
      |  ${Num.moneySumSql("l_extendedprice")} AS sum_price
      |FROM lineitem
      |WHERE l_orderkey IN
      |  (SELECT o_orderkey FROM orders WHERE o_totalprice > $BloomThresh)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------ skew diagnosis

  /** The detect half of the skew story ([[saltedJoin]] is the fix): the
    * hottest join keys of a prospective shuffle, each with its exact
    * count, integer-micro share of all rows, and bit-length frequency
    * bucket. Run before a big join, this is the table that tells you
    * whether AQE's skew split will cope or a key needs salting/isolation
    * — a key holding ≫ 1/shufflePartitions of the rows is the tell.
    *
    * SCALE: one partial-aggregated count shuffle over the join key (the
    * diagnosis costs one groupBy — strictly cheaper than the join it
    * protects), a TakeOrderedAndProject for the hot head, and a 1-row
    * total broadcast for the share. Integer micro shares, key tie-break.
    */
  def skewDiagnosis: Q = (s, d) => {
    val counts = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val total = Tables.orders(s, d).agg(count(lit(1)).as("total"))
    counts.orderBy(col("n").desc, col("o_custkey").asc).limit(10)
      .crossJoin(broadcast(total))
      .select(col("o_custkey"), col("n"),
        expr("(n * 1000000) div total").as("share_micro"),
        length(bin(col("n"))).as("freq_bucket"))
      .orderBy(col("n").desc, col("o_custkey").asc)
  }

  val skewDiagnosisSql: String =
    """WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey),
      |t AS (SELECT count(*) AS total FROM orders)
      |SELECT o_custkey, n, (n * 1000000) // total AS share_micro,
      |  CAST(length(bin(n)) AS INTEGER) AS freq_bucket
      |FROM c CROSS JOIN t
      |ORDER BY n DESC, o_custkey ASC LIMIT 10""".stripMargin

  /** The diagnosis WIRED TO the remediation ([[skewDiagnosis]] reports the
    * census; [[graft.ops.ScaleJoins.skewSafeJoin]] consumes it): a join
    * over a deliberately skewed fixture — every 5th lineitem folds onto
    * key 1, so one key holds ~20% of all rows (≫ 1/shufflePartitions,
    * exactly the skew that stalls a straggler partition) — run through
    * census-driven PARTIAL salting: only keys holding ≥ 1000 rows are
    * salted (factor 8); the ~999 cold keys join unsalted. The oracle runs
    * the plain unsalted join — hash-equality proves partial salting
    * changes nothing but the shuffle layout.
    */
  def skewSafeJoin: Q = (s, d) => {
    val big = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 5 === 0, lit(1))
        .otherwise(col("l_orderkey") % 1000).as("k"),
      col("l_extendedprice"))
    val small = Tables.customer(s, d)
      .filter(col("c_custkey") <= 1000)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    ScaleJoins.skewSafeJoin(big, small, Seq("k"), factor = 8, hotMinRows = 1000)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_lines"),
        Num.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  val skewSafeJoinSql: String =
    s"""WITH big AS (SELECT CASE WHEN l_orderkey % 5 = 0 THEN 1
      |    ELSE l_orderkey % 1000 END AS k, l_extendedprice FROM lineitem),
      |small AS (SELECT c_custkey AS k, c_mktsegment FROM customer
      |  WHERE c_custkey <= 1000)
      |SELECT c_mktsegment, count(*) AS n_lines,
      |  ${Num.moneySumSql("l_extendedprice")} AS sum_price
      |FROM big JOIN small USING (k)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Hive-partitioned orders (directory per order year) under scratch,
    * written once per data dir — the partitioned-fact fixture for the
    * dynamic-partition-pruning gate.
    */
  private def ordersByYearDir(s: SparkSession, d: String): String = {
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val dir = Scratch.dir(s"orders_by_year_$tag")
    if (!new java.io.File(dir, "_SUCCESS").exists) {
      Scratch.wipe(dir)
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    }
    dir
  }

  /** Year dimension as a PARQUET relation (not a local relation —
    * `ConvertToLocalRelation` would fold the filter into the relation
    * before the `PartitionPruning` rule looks for a selective predicate,
    * and DPP would never fire). The selectable column is an INT compared
    * with `===` because `isLikelySelective` recognizes binary comparisons
    * but not bare boolean attributes. Year range covers every SF's order
    * span with headroom.
    */
  private def yearDimDir(s: SparkSession, d: String): String = {
    import s.implicits._
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val dir = Scratch.dir(s"year_dim_$tag")
    if (!new java.io.File(dir, "_SUCCESS").exists) {
      Scratch.wipe(dir)
      (1990 to 2010).map(y => (y, y % 3)).toDF("y", "y_mod")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** DYNAMIC PARTITION PRUNING: the fact is hive-partitioned by order
    * year; the filter lives on the DIM side (selected years), so static
    * pruning can't fire — at runtime Spark builds the dim's key set from
    * the broadcast exchange and injects it as a partition filter
    * (`dynamicpruning` InSubquery) into the fact scan, which then reads
    * only the matching year directories. THE mechanism that makes
    * star-schema queries over a date-partitioned 100 TB fact read days,
    * not the table; the gate proves result-correctness, `PlanSpec` pins
    * the pruning subquery's presence in the scan.
    */
  def dppJoin: Q = (s, d) => {
    val fact = s.read.parquet(ordersByYearDir(s, d))
    val dim = s.read.parquet(yearDimDir(s, d))
    fact.join(broadcast(dim.filter(col("y_mod") === 0)), col("o_year") === col("y"))
      .groupBy(col("o_year").cast("int").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        Num.moneySum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_year"))
  }

  val dppJoinSql: String =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  count(*) AS n_orders,
      |  ${Num.moneySumSql("o_totalprice")} AS revenue
      |FROM orders WHERE year(o_orderdate) % 3 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Z-order (Morton) clustering key over (p_partkey, retail-price cents)
    * — the 2-D layout key behind [[graft.core.Maintenance.compact]]'s
    * multi-dimension clustering (Delta's OPTIMIZE ZORDER BY role). The
    * gate hash-checks the codegen'd native `graft_zorder` bit interleave
    * against the oracle's arithmetic expansion, plus each row's
    * coarse bucket along the curve (top 10 key bits) — the quantity data-skipping actually uses
    * (rows close in both dimensions share high key bits → same file).
    *
    * Scale shape: pure projection (no shuffle); the sort by the key is
    * what Maintenance does at write time, not here.
    */
  def zorderKey: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") % 97 === 0)
      .select(col("p_partkey"),
        call_function("graft_zorder", col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long")).as("zkey"))
      .withColumn("z_bucket", shiftright(col("zkey"), 52).cast("int"))
      .orderBy(col("p_partkey"))

  val zorderKeySql: String = {
    // key = Σ_i ((x>>i & 1) << (2i+1)) + ((y>>i & 1) << 2i), i = 0..30,
    // inputs masked to 31 bits — the same MSB-first interleave as
    // ZOrderUtil.interleave2
    val terms = (0 to 30).flatMap(i => Seq(
      s"(((x >> $i) & 1) << ${2 * i + 1})",
      s"(((y >> $i) & 1) << ${2 * i})")).mkString(" + ")
    s"""WITH src AS (SELECT p_partkey,
      |    p_partkey & 2147483647 AS x,
      |    CAST(round(p_retailprice * 100) AS BIGINT) & 2147483647 AS y
      |  FROM part WHERE p_partkey % 97 = 0),
      |k AS (SELECT p_partkey, CAST($terms AS BIGINT) AS zkey FROM src)
      |SELECT p_partkey, zkey,
      |  CAST(zkey >> 52 AS INTEGER) AS z_bucket
      |FROM k ORDER BY p_partkey""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_zorder_key" -> zorderKey,
    "q_dpp_join" -> dppJoin,
    "q_salted_join" -> saltedJoin,
    "q_bucketed_join" -> bucketedJoin,
    "q_bloom_semi_join" -> bloomSemiJoin,
    "q_skew_diagnosis" -> skewDiagnosis,
    "q_skew_safe_join" -> skewSafeJoin,
  )

  val oracles: Map[String, String] = Map(
    "q_zorder_key" -> zorderKeySql,
    "q_dpp_join" -> dppJoinSql,
    "q_salted_join" -> saltedJoinSql,
    "q_bucketed_join" -> bucketedJoinSql,
    "q_bloom_semi_join" -> bloomSemiJoinSql,
    "q_skew_diagnosis" -> skewDiagnosisSql,
    "q_skew_safe_join" -> skewSafeJoinSql,
  )
}
