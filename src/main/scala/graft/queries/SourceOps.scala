package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Source/sink format breadth beyond the reference's CSV + Parquet: JSON
  * lines and ORC, each proven by a lossless write→read→join→rollup whose
  * oracle computes the same rollup straight from the parquet originals —
  * any reader/writer asymmetry (type coercion, null handling, encoding)
  * breaks the hash.
  *
  * Scale notes: JSON is the interchange format (schema-on-read, explicit
  * `StructType` here — inference would scan twice); ORC is the columnar
  * alternative when the lake standardizes on it — same pushdown/pruning
  * machinery as parquet in Spark.
  */
object SourceOps {

  type Q = (SparkSession, String) => DataFrame

  /** JSON-lines round-trip: supplier → .jsonl → explicit-schema read →
    * broadcast-join nation → per-nation rollup.
    */
  def jsonRoundtrip: Q = (s, d) => {
    val tmp = Scratch.dir("graft_json")
    Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .coalesce(1).write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
    val back = s.read.schema(schema).json(tmp)
    back.join(broadcast(Tables.nation(s, d)),
        back("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        Num.moneySum(col("s_acctbal")).as("sum_acctbal"))
      .orderBy(col("n_name"))
  }

  val jsonRoundtripSql: String =
    s"""SELECT n_name, count(*) AS n_suppliers,
      |  ${Num.moneySumSql("s_acctbal")} AS sum_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** ORC round-trip: events (timestamps included) → ORC → read → hourly
    * rollup. Timestamp fidelity through a second columnar format is the
    * point.
    */
  def orcRoundtrip: Q = (s, d) => {
    val tmp = Scratch.dir("graft_orc")
    Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))
  }

  val orcRoundtripSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_json_roundtrip" -> jsonRoundtrip,
    "q_orc_roundtrip" -> orcRoundtrip,
  )

  val oracles: Map[String, String] = Map(
    "q_json_roundtrip" -> jsonRoundtripSql,
    "q_orc_roundtrip" -> orcRoundtripSql,
  )
}
