package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.TableLog

/** Dynamic (runtime) pruning through the graft DSv2 door —
  * [[GraftRuntimePrune]]. Spark's own DSv2 FileScan never implements
  * `SupportsRuntimeFiltering`, so these tests pin the behavior our
  * wrapper adds: a star join's runtime join keys must prune fact
  * partitions (visible hive layout) and fact buckets (hidden transform
  * layout) at the file level, without changing a single row of output.
  */
class GraftDppSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String) = {
    val d = java.nio.file.Files.createTempDirectory(name)
    java.nio.file.Files.delete(d)
    d.toString
  }

  /** The BatchScanExec nodes of an executed plan (AQE- and DML-aware:
    * a command's plan hangs off CommandResultExec, not `children`).
    */
  private def batchScans(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: AdaptiveSparkPlanExec => batchScans(a.executedPlan)
    case c: org.apache.spark.sql.execution.CommandResultExec =>
      batchScans(c.commandPhysicalPlan)
    case b: BatchScanExec => Seq(b)
    case other => other.children.flatMap(batchScans) ++
      other.subqueries.flatMap(batchScans)
  }

  /** Data files planned by the FACT scan (post-runtime-filtering).
    * `BatchScanExec.partitions` is the UNfiltered view; the runtime-pruned
    * set lives in the private `filteredPartitions` — read it reflectively.
    */
  private def plannedFactFiles(df: DataFrame): Seq[String] = {
    df.collect() // execute first: DPP filters resolve at runtime
    val scans = batchScans(df.queryExecution.executedPlan)
      .filter(_.runtimeFilters.nonEmpty)
    assert(scans.nonEmpty, "no runtime-filtered BatchScanExec in plan:\n" +
      df.queryExecution.executedPlan)
    scans.flatMap { b =>
      val m = b.getClass.getDeclaredMethods
        .find(_.getName.endsWith("filteredPartitions")).get
      m.setAccessible(true)
      m.invoke(b).asInstanceOf[Seq[Seq[org.apache.spark.sql.connector.read.InputPartition]]]
        .flatten
    }.flatMap {
      case fp: FilePartition => fp.files.map(_.urlEncodedPath)
      case _ => Seq.empty
    }.distinct
  }

  private def withDppConfs[T](f: => T): T = {
    // non-AQE planning keeps the executed plan directly assertable; DPP
    // itself is on by default (dynamicPartitionPruning.enabled=true)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("star join on a hive partition column prunes fact partitions at runtime") {
    val wh = freshDir("graft_dpp_wh")
    val dir = s"$wh/gold/fact"
    // 10 date-keyed partitions, one file each
    val fact = spark.range(0, 10000)
      .select($"id", ($"id" % 10).as("day_key"),
        ($"id" % 97).cast("double").as("v"))
    TableLog.append(spark, dir, fact.repartition(10, $"day_key"),
      partitionBy = Seq("day_key"))
    val cat = "graftdpp"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    // the dim must be FILE-backed: a LocalRelation constant-folds its
    // filter away and PartitionPruning sees no selective build side
    (0 until 10).map(d => (d, if (d < 2) "keep" else "drop"))
      .toDF("day_key", "flag")
      .write.mode("overwrite").parquet(s"$wh/dim")
    spark.read.parquet(s"$wh/dim").createOrReplaceTempView("dpp_dim")

    withDppConfs {
      val q = spark.sql(
        s"""SELECT f.day_key, count(*) AS n, sum(f.v) AS sv
           |FROM $cat.gold.fact f JOIN dpp_dim d ON f.day_key = d.day_key
           |WHERE d.flag = 'keep'
           |GROUP BY f.day_key ORDER BY f.day_key""".stripMargin)
      val files = plannedFactFiles(q)
      assert(files.nonEmpty && files.forall(f =>
        f.contains("day_key=0") || f.contains("day_key=1")),
        s"unpruned fact files: $files")

      // identical rows with runtime pruning disabled
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try {
        val expected = spark.sql(
          s"""SELECT f.day_key, count(*) AS n, sum(f.v) AS sv
             |FROM $cat.gold.fact f JOIN dpp_dim d ON f.day_key = d.day_key
             |WHERE d.flag = 'keep'
             |GROUP BY f.day_key ORDER BY f.day_key""".stripMargin).collect()
        assert(q.collect().toSeq == expected.toSeq)
      } finally spark.conf
        .set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
  }

  test("runtime join keys prune hidden bucket-transform layout") {
    val dir = freshDir("graft_dpp_bucket")
    val fact = spark.range(0, 8000).select($"id", ($"id" * 3).as("v"))
    TableLog.append(spark, dir, fact, transforms = Seq(BucketOf(8, "id")))
    // file-backed dim with a selective filter (see partition-column test)
    val dimPath = freshDir("graft_dpp_bucket_dim")
    Seq((5L, "x"), (10L, "y"), (20L, "zz"), (21L, "zz"), (22L, "zz"))
      .toDF("id", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(length($"tag") === 1)

    withDppConfs {
      val t = spark.read.format("graft").load(dir)
      val q = t.join(broadcast(dim), "id").groupBy($"tag")
        .agg(sum($"v").as("sv")).orderBy($"tag")
      val files = plannedFactFiles(q)
      val all = t.select(input_file_name()).distinct().count()
      assert(files.length < all,
        s"bucket runtime pruning kept all $all files")
      // keys 5 and 10 land in at most 2 buckets -> at most 2 of 8 files
      assert(files.length <= 2, s"expected <=2 bucket files, got $files")
      assert(q.collect().map(_.toSeq).toSeq ==
        Seq(Seq("x", 15L), Seq("y", 30L)))
    }
  }

  test("DPP through the catalog under AQE returns identical results") {
    val wh = freshDir("graft_dpp_aqe")
    val dir = s"$wh/gold/fct"
    val fact = spark.range(0, 5000)
      .select($"id", ($"id" % 7).as("k"), ($"id" % 13).as("m"))
    TableLog.append(spark, dir, fact.repartition(7, $"k"),
      partitionBy = Seq("k"))
    val cat = "graftdppaqe"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val dim = (0L until 7L).map(k => (k, k % 3 == 0)).toDF("k", "keep")
    dim.createOrReplaceTempView("dpp_dim_aqe")
    val got = spark.sql(
      s"""SELECT f.k, sum(f.m) AS sm FROM $cat.gold.fct f
         |JOIN dpp_dim_aqe d ON f.k = d.k WHERE d.keep
         |GROUP BY f.k ORDER BY f.k""".stripMargin).collect()
    val exp = fact.filter($"k" % 3 === 0).groupBy($"k")
      .agg(sum($"m").as("sm")).orderBy($"k").collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("MERGE target scan is runtime-pruned by the source's join keys") {
    val wh = freshDir("graft_dpp_dml")
    val dir = s"$wh/gold/tgt"
    val fact = spark.range(0, 10000)
      .select($"id", ($"id" % 10).as("pk"), lit(1.0).as("v"))
    TableLog.append(spark, dir, fact.repartition(10, $"pk"),
      partitionBy = Seq("pk"))
    val cat = "graftdppdml"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    // file-backed source; the selective filter lives in the USING
    // subquery. pk cast to INT to match the dir-inferred partition type:
    // a cast around the join key defeats DPP insertion on either engine
    // side (same as stock Spark on V1 tables)
    fact.select($"id", $"pk".cast("int").as("pk"),
        ($"pk" < 2).as("hot"), lit(9.0).as("nv"))
      .write.parquet(s"$wh/src")
    spark.read.parquet(s"$wh/src").createOrReplaceTempView("dpp_src")

    withDppConfs {
      val m = spark.sql(
        s"""MERGE INTO $cat.gold.tgt t
           |USING (SELECT * FROM dpp_src WHERE hot) s
           |ON t.pk = s.pk AND t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
      val scans = batchScans(m.queryExecution.executedPlan)
        .filter(_.runtimeFilters.nonEmpty)
      assert(scans.nonEmpty, "MERGE target scan got no runtime filter:\n" +
        m.queryExecution.executedPlan)
      val files = scans.flatMap { b =>
        val mm = b.getClass.getDeclaredMethods
          .find(_.getName.endsWith("filteredPartitions")).get
        mm.setAccessible(true)
        mm.invoke(b).asInstanceOf[Seq[Seq[org.apache.spark.sql.connector.read.InputPartition]]]
          .flatten
      }.flatMap {
        case fp: FilePartition => fp.files.map(_.urlEncodedPath)
        case _ => Seq.empty
      }
      assert(files.nonEmpty && files.forall(f =>
        f.contains("pk=0") || f.contains("pk=1")),
        s"unpruned MERGE target files: $files")
    }
    // row-level semantics unchanged by the pruning
    val got = spark.table(s"$cat.gold.tgt")
      .groupBy($"pk").agg(sum($"v").as("sv")).orderBy($"pk").collect()
    val exp = fact.withColumn("v", when($"pk" < 2, 9.0).otherwise($"v"))
      .groupBy($"pk").agg(sum($"v").as("sv")).orderBy($"pk").collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("untranslatable or foreign-column runtime filters prune nothing (and break nothing)") {
    val dir = freshDir("graft_dpp_none")
    TableLog.append(spark, dir,
      spark.range(0, 100).select($"id", ($"id" % 3).as("g")))
    // unpartitioned, untransformed table: filterAttributes must be empty,
    // a join stays correct, and no DPP subquery is inserted
    val dim = Seq((0L, "a"), (1L, "b")).toDF("g", "t")
    val t = spark.read.format("graft").load(dir)
    val q = t.join(broadcast(dim), "g").groupBy($"t").count().orderBy($"t")
    assert(q.collect().map(_.toSeq).toSeq ==
      Seq(Seq("a", 34L), Seq("b", 33L)))
    assert(batchScans(q.queryExecution.executedPlan)
      .forall(_.runtimeFilters.isEmpty))
  }
}
