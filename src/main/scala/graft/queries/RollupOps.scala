package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{IncrementalRollup, Tables}
import graft.ops.{Hashing, Sketches}

/** Oracle gate for the incrementally-maintained rollup: replay the orders
  * table as three year-sliced batches through [[IncrementalRollup]] (state
  * on disk, merged partial aggregates incl. the KMV distinct sketch), then
  * read the state back. The DuckDB oracle computes the same statistics in
  * ONE pass over the full table — hash equality proves the incremental
  * merge path is lossless: counts/cents-sums are associative, min/max
  * combine, and the k-min-set merge keeps exactly the k smallest of the
  * union, so batch boundaries and arrival order cannot leak into results.
  */
object RollupOps {

  type Q = (SparkSession, String) => DataFrame

  def incrementalRollup: Q = (s, d) => {
    // state path keyed by sf dir; reset so every invocation replays cleanly
    val dir = Scratch.dir("rollup_" + java.lang.Integer.toHexString(d.hashCode))
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val orders = Tables.orders(s, d).withColumn("yr", year(col("o_orderdate")))
    Seq(
      orders.filter(col("yr") <= 1996),
      orders.filter(col("yr").between(1997, 1998)),
      orders.filter(col("yr") >= 1999)
    ).foreach(b => IncrementalRollup.update(s, dir, b,
      Seq("o_orderpriority"), "o_totalprice", distinctCol = Some("o_custkey")))
    IncrementalRollup.result(s, dir)
      .select(col("o_orderpriority"), col("cnt"), col("sum_value"),
        col("avg_value"), col("min_value"), col("max_value"),
        col("approx_distinct"))
      .orderBy(col("o_orderpriority"))
  }

  val incrementalRollupSql: String = {
    val h = Hashing.md5LongSql("o_custkey")
    val k = IncrementalRollup.KmvK
    s"""WITH base AS (SELECT o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_custkey
      |  FROM orders),
      |st AS (SELECT o_orderpriority,
      |    CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(sum(cents) AS BIGINT) AS sum_cents,
      |    min(cents) AS min_cents, max(cents) AS max_cents
      |  FROM base GROUP BY o_orderpriority),
      |hs AS (SELECT DISTINCT o_orderpriority, $h AS h FROM orders),
      |rk AS (SELECT o_orderpriority, h,
      |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS nd
      |  FROM hs),
      |kth AS (SELECT o_orderpriority, max(nd) AS nd,
      |    max(CASE WHEN rn = $k THEN h END) AS hk
      |  FROM rk GROUP BY o_orderpriority)
      |SELECT s.o_orderpriority, s.cnt,
      |  CAST(s.sum_cents AS DOUBLE) / 100.0 AS sum_value,
      |  floor((CAST(s.sum_cents AS DOUBLE) / s.cnt) / 100.0 * 1000000 + 0.5) / 1000000 AS avg_value,
      |  CAST(s.min_cents AS DOUBLE) / 100.0 AS min_value,
      |  CAST(s.max_cents AS DOUBLE) / 100.0 AS max_value,
      |  ${Sketches.kmvEstimateSql("t.nd", "t.hk", k)} AS approx_distinct
      |FROM st s JOIN kth t USING (o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_incremental_rollup" -> incrementalRollup,
  )

  val oracles: Map[String, String] = Map(
    "q_incremental_rollup" -> incrementalRollupSql,
  )
}
