package graft.faers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bronze ingest: one parameterized ingester replacing the reference's 7
  * near-identical scripts (src/bronze/ingest_*.py — they differ only in
  * schema and path). Contract (ingest_demographics.py:53-67):
  * `$`-separated CSV with header, PERMISSIVE mode, explicit all-string
  * schema, ingest-audit columns, append-mode sink partitioned by
  * `_ingest_ts`.
  *
  * Scale: `_ingest_ts` partitioning turns the silver layer's
  * latest-partition read into a metadata-only prune — the 100 TB history
  * never gets scanned for an incremental run.
  */
object Bronze {

  def readLanding(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "$")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  def ingest(spark: SparkSession, table: String, landingPath: String,
             fixedClock: Option[java.time.Instant] = None,
             database: String = "bronze"): Unit = {
    val (_, schema) = Schemas.tables(table)
    val bronze = Transforms.addIngestionMetadata(
      readLanding(spark, landingPath, schema), fixedClock)
    bronze.write
      .partitionBy("_ingest_ts")
      .mode("append")
      .saveAsTable(s"$database.$table")
  }

  /** Ingest every FAERS table from a quarterly landing directory laid out
    * as `<dir>/<PREFIX><YY>Q<N>.txt` (config.yml + ingest paths).
    */
  def ingestQuarter(spark: SparkSession, landingDir: String, yy: Int, q: Int,
                    fixedClock: Option[java.time.Instant] = None,
                    database: String = "bronze"): Unit =
    Pipeline.inParallel(Schemas.tables.toSeq) { case (table, (prefix, _)) =>
      // zero-pad: the FAERS layout is <PREFIX>YYQN.txt (DEMO05Q1, not DEMO5Q1)
      ingest(spark, table, f"$landingDir/$prefix$yy%02dQ$q.txt", fixedClock, database)
    }
}
