package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.TableLog

/** The SQL/catalog front door: `spark.read.format("graft")` and
  * `spark.table("graft.schema.name")` must answer exactly like
  * `TableLog.table(...)`, resolve time travel, and keep the manifest
  * index's pruning/skipping through the DSv2 scan.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String) = {
    val d = java.nio.file.Files.createTempDirectory(name)
    java.nio.file.Files.delete(d)
    d.toString
  }

  test("format(\"graft\").load reads the snapshot; versionAsOf time-travels") {
    val dir = freshDir("graft_dsv2")
    TableLog.append(spark,
      dir, spark.range(0, 100).select($"id", ($"id" % 5).as("g")).coalesce(1))
    TableLog.append(spark,
      dir, spark.range(100, 150).select($"id", ($"id" % 5).as("g")).coalesce(1))
    val tip = spark.read.format("graft").load(dir)
    assert(tip.count() == 150)
    assert(tip.schema.fieldNames.toSet == Set("id", "g"))
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(dir)
    assert(v1.count() == 100)
    // agrees with the API path value-for-value
    val api = TableLog.table(spark, dir).agg(sum($"id")).as[Long].head()
    val sql = tip.agg(sum($"id")).as[Long].head()
    assert(api == sql)
  }

  test("catalog: spark.table + SQL + VERSION AS OF resolve TableLog tables") {
    val wh = freshDir("graft_wh")
    val dir = s"$wh/gold/dim_x"
    TableLog.append(spark,
      dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    TableLog.append(spark, dir, Seq((3L, "c")).toDF("k", "v").coalesce(1))
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    assert(spark.table("graft.gold.dim_x").count() == 3)
    assert(spark.sql("SELECT sum(k) AS s FROM graft.gold.dim_x")
      .as[Long].head() == 6L)
    assert(spark.sql("SELECT count(*) FROM graft.gold.dim_x VERSION AS OF 1")
      .as[Long].head() == 2L)
    // catalog listing sees the table
    assert(spark.sql("SHOW TABLES IN graft.gold").collect()
      .map(_.getString(1)).contains("dim_x"))
  }

  test("V2 scan prunes partitions and skips by manifest stats") {
    val dir = freshDir("graft_dsv2_prune")
    val df = spark.range(0, 1000)
      .select($"id", ($"id" % 4).as("p"), ($"id" * 2).as("val"))
    TableLog.append(spark, dir, df.repartition(4, $"p"),
      partitionBy = Seq("p"), statsCol = Some("id"))
    TableLog.append(spark, dir,
      spark.range(1000, 2000).select($"id", ($"id" % 4).as("p"), ($"id" * 2).as("val"))
        .repartition(4, $"p"),
      partitionBy = Seq("p"), statsCol = Some("id"))
    val t = spark.read.format("graft").load(dir)
    // partition pruning: only p=2 files reach the scan
    val pruned = t.filter($"p" === 2)
    val scannedP = pruned.select(input_file_name()).distinct()
      .as[String].collect()
    assert(scannedP.nonEmpty && scannedP.forall(_.contains("p=2")), scannedP.toSeq)
    assert(pruned.count() == 500)
    // stats skipping: id < 10 touches only the first commit's files
    val skipped = t.filter($"id" < 10)
    val scannedS = skipped.select(input_file_name()).distinct().as[String].collect()
    val allFiles = t.select(input_file_name()).distinct().as[String].collect()
    assert(scannedS.length < allFiles.length,
      s"stats skipping did not drop files: ${scannedS.length} of ${allFiles.length}")
    assert(skipped.count() == 10)
    // and the filter is pushed into the parquet scan
    val plan = skipped.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ParquetScan"), plan)
  }

  test("snapshots with row-level deletes are rejected with a pointer to the API") {
    val dir = freshDir("graft_dsv2_dv")
    TableLog.append(spark,
      dir, spark.range(0, 50).select($"id", lit("x").as("v")).coalesce(1))
    TableLog.deleteWhereDv(spark, dir, $"id" === 7L)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").load(dir).collect()
    }
    assert(e.getMessage.contains("TableLog.table"), e.getMessage)
    // the API path still answers (and hides the deleted row)
    assert(TableLog.table(spark, dir).count() == 49)
  }
}
