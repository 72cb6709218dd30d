package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided analytical tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Columnar scans get predicate
  * pushdown + column pruning for free; at 100 TB these would be
  * directory-partitioned datasets and the same `spark.read.parquet(dir)`
  * call picks up partition pruning.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts arrives in whatever physical type the generator used this
    * round — TIMESTAMP(NANOS) (vectorized reader rejects it; with
    * spark.sql.legacy.parquet.nanosAsLong=true it surfaces as
    * nanos-since-epoch LongType), or timestamp[us] without a timezone flag
    * (Spark 4 infers TIMESTAMP_NTZ, which refuses long casts and diverges
    * from LTZ in epoch-math functions). Normalize both to the session-local
    * TimestampType here — with the pinned UTC session timezone the NTZ→LTZ
    * cast is micros-identity — so every downstream query sees one stable
    * type regardless of generator drift.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
