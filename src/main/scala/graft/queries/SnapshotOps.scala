package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.SnapshotDiff

/** CDC-by-differencing: derive a change feed from two snapshot versions of
  * a plain parquet table (see ops.SnapshotDiff). The two "versions" are
  * deterministic slices of orders — overlapping date ranges with a seeded
  * price perturbation — so inserts, deletes, AND updates all occur and the
  * DuckDB oracle can rebuild the exact same feed.
  *
  * Payload hashing runs over integer cents, not double-to-string (double
  * rendering differs across engines; long rendering doesn't).
  */
object SnapshotOps {

  type Q = (SparkSession, String) => DataFrame

  private def snaps(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("o_orderdate"))
    val oldSnap = o.filter(col("o_orderdate") < "1998-01-01")
      .drop("o_orderdate")
    val newSnap = o.filter(col("o_orderdate") >= "1995-01-01")
      .withColumn("price_cents",
        when(col("o_orderkey") % 13 === 0, col("price_cents") + 1)
          .otherwise(col("price_cents")))
      .drop("o_orderdate")
    (oldSnap, newSnap)
  }

  /** Change feed rolled up per change_type (full feed is row-per-key). */
  def snapshotDiff: Q = (s, d) => {
    val (oldSnap, newSnap) = snaps(s, d)
    SnapshotDiff.diff(oldSnap, newSnap, Seq("o_orderkey"),
        tracked = Seq("o_orderstatus", "price_cents"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_keys"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("change_type"))
  }

  val snapshotDiffSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, o_orderdate
      |  FROM orders),
      |old_snap AS (
      |  SELECT o_orderkey,
      |    md5(concat_ws('||', coalesce(CAST(o_orderstatus AS VARCHAR), 'NULL'),
      |      coalesce(CAST(price_cents AS VARCHAR), 'NULL'))) AS old_hash
      |  FROM base WHERE o_orderdate < TIMESTAMP '1998-01-01'),
      |new_snap AS (
      |  SELECT o_orderkey,
      |    md5(concat_ws('||', coalesce(CAST(o_orderstatus AS VARCHAR), 'NULL'),
      |      coalesce(CAST(CASE WHEN o_orderkey % 13 = 0 THEN price_cents + 1
      |        ELSE price_cents END AS VARCHAR), 'NULL'))) AS new_hash
      |  FROM base WHERE o_orderdate >= TIMESTAMP '1995-01-01'),
      |feed AS (
      |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |    CASE WHEN o.old_hash IS NULL THEN 'insert'
      |         WHEN n.new_hash IS NULL THEN 'delete'
      |         WHEN o.old_hash <> n.new_hash THEN 'update' END AS change_type
      |  FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey))
      |SELECT change_type, count(*) AS n_keys,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM feed WHERE change_type IS NOT NULL
      |GROUP BY change_type ORDER BY change_type""".stripMargin

  val queries: Map[String, Q] = Map("q_snapshot_diff" -> snapshotDiff)
  val oracles: Map[String, String] = Map("q_snapshot_diff" -> snapshotDiffSql)
}
