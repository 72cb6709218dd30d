package graft.faers

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The bronze CSV contract under malformed input: PERMISSIVE mode must land
  * bad rows as nulls (never fail the job), short rows pad with nulls, extra
  * separators overflow-truncate — matching the reference reader's settings
  * (ingest_demographics.py:53-60). At 100 TB a single malformed line
  * aborting an ingest is not an option.
  */
class BronzeSpec extends SparkSpec {

  test("PERMISSIVE csv: good rows parse, short rows pad, empty fields null") {
    val dir = Files.createTempDirectory("graft_bronze").toString
    val file = new java.io.File(dir, "demo.txt")
    val w = new java.io.PrintWriter(file)
    // FAERS demographics header (subset irrelevant — schema is positional by
    // name): use the real schema's first columns
    val (_, schema) = Schemas.tables("demographics")
    w.println(schema.fieldNames.mkString("$"))
    w.println(Seq.fill(schema.size)("v").mkString("$"))     // full row
    w.println("only_one_field")                              // short row -> padded
    w.println("a$$c" + "$" * (schema.size - 3))              // empty field -> null
    w.close()

    val df = Bronze.readLanding(spark, file.toString, schema)
    assert(df.count() == 3)
    val rows = df.collect()
    assert(rows(0).toSeq.forall(_ == "v"))
    // short row: first col kept, the rest null
    assert(rows(1).getString(0) == "only_one_field")
    assert((1 until schema.size).forall(i => rows(1).isNullAt(i)))
    // empty middle field is null (emptyValue default)
    assert(rows(2).getString(0) == "a" && rows(2).isNullAt(1) && rows(2).getString(2) == "c")
  }

  test("ingest stamps audit metadata and appends partitioned by _ingest_ts") {
    val dir = Files.createTempDirectory("graft_bronze2").toString
    val (_, schema) = Schemas.tables("outcomes")
    val file = new java.io.File(dir, "OUTC25Q1.txt")
    val w = new java.io.PrintWriter(file)
    w.println(schema.fieldNames.mkString("$"))
    w.println(schema.fieldNames.map(_ => "x").mkString("$"))
    w.close()
    spark.sql("CREATE DATABASE IF NOT EXISTS bronze_spec")
    spark.sql("DROP TABLE IF EXISTS bronze_spec.outcomes")
    val clock = java.time.Instant.parse("2025-01-15T00:00:00Z")
    Bronze.ingest(spark, "outcomes", file.toString, Some(clock), "bronze_spec")
    Bronze.ingest(spark, "outcomes", file.toString,
      Some(clock.plusSeconds(3600)), "bronze_spec")
    val t = spark.table("bronze_spec.outcomes")
    assert(t.count() == 2) // append, not overwrite
    assert(t.columns.contains("_ingest_ts") && t.columns.contains("_source_file"))
    assert(t.select("_ingest_ts").distinct().count() == 2)
    spark.sql("DROP TABLE bronze_spec.outcomes")
  }
}
