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

  val queries: Map[String, Q] = Map(
    "q_salted_join" -> saltedJoin,
    "q_bucketed_join" -> bucketedJoin,
  )

  val oracles: Map[String, String] = Map(
    "q_salted_join" -> saltedJoinSql,
    "q_bucketed_join" -> bucketedJoinSql,
  )
}
