package graft.core

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.GraftCatalog

/** [[TableLog.changes]] — the log-derived change feed (Delta CDF role):
  * every data-change commit in a version window surfaces as typed change
  * rows reconstructed from the manifest delta alone, at O(changed data).
  */
class TableLogChangesSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh(name: String): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory(name)
    java.nio.file.Files.delete(d)
    val cat = name.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d.toString)
    (d.toString, cat)
  }

  private def feed(dir: String, from: Long, to: Long, keys: Seq[String]) =
    TableLog.changes(spark, dir, from, to, keys)
      .groupBy($"_commit_version", $"_change_type")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("append -> insert; dv delete -> delete; each stamped with its version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chg_basic").toString
    TableLog.append(spark, dir,
      spark.range(0, 50).select($"id", ($"id" % 5).as("v")).coalesce(1)) // v1
    TableLog.append(spark, dir,
      spark.range(50, 60).select($"id", ($"id" % 5).as("v")).coalesce(1)) // v2
    TableLog.deleteWhereDv(spark, dir, $"id" < 3) // v3
    val f = feed(dir, 0, 3, Seq("id"))
    assert(f == Map((1L, "insert") -> 50L, (2L, "insert") -> 10L,
      (3L, "delete") -> 3L))
    // window restriction: only v3
    assert(feed(dir, 2, 3, Seq("id")) == Map((3L, "delete") -> 3L))
    // the dv pre-image carries the DELETED row's values
    val pre = TableLog.changes(spark, dir, 2, 3, Seq("id"))
      .select($"id", $"v").as[(Long, Long)].collect().toSet
    assert(pre == Set((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("SQL UPDATE / MERGE delta commits classify exactly with a key") {
    val (wh, cat) = freshWh("graft_chg_dml")
    val dir = s"$wh/s/t"
    TableLog.append(spark, dir,
      spark.range(0, 90).filter($"id" % 3 === 0)
        .select($"id", ($"id" * 10).as("v")).coalesce(1)) // v1: 30 rows
    spark.sql(s"UPDATE $cat.s.t SET v = -1 WHERE id % 6 = 0") // v2: 15 rows
    spark.range(0, 90).filter($"id" % 2 === 0)
      .select($"id", lit(7L).as("v")).createOrReplaceTempView("chg_src")
    // matched = %6==0 (15 keys); matched-delete = %30==0 (3); insert =
    // %2==0 && %3!=0 (30 of 45 even keys)
    spark.sql(s"""MERGE INTO $cat.s.t t USING chg_src s ON t.id = s.id
      WHEN MATCHED AND s.id % 30 = 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")      // v3
    val f = feed(dir, 1, 3, Seq("id"))
    assert(f == Map(
      (2L, "update_preimage") -> 15L, (2L, "update_postimage") -> 15L,
      (3L, "delete") -> 3L,
      (3L, "update_preimage") -> 12L, (3L, "update_postimage") -> 12L,
      (3L, "insert") -> 30L), f)
    // v2 post-images all carry the updated value
    assert(TableLog.changes(spark, dir, 1, 2, Seq("id"))
      .filter($"_change_type" === "update_postimage" && $"v" =!= -1L)
      .count() == 0)
    // keyless fallback on the same UPDATE window: wholesale pre/post
    assert(feed(dir, 1, 2, Seq.empty) == Map(
      (2L, "update_preimage") -> 15L, (2L, "update_postimage") -> 15L))
  }

  test("cross-partition UPDATE: pre-image in the old partition, post-image " +
    "in the new, paired as one update by key") {
    val (wh, cat) = freshWh("graft_chg_xpart")
    val dir = s"$wh/s/p"
    TableLog.append(spark, dir,
      spark.range(0, 40).select($"id", ($"id" % 2).as("p"))
        .repartition(2, $"p"), partitionBy = Seq("p"))              // v1
    spark.sql(s"UPDATE $cat.s.p SET p = 5 WHERE id = 8")            // v2
    val rows = TableLog.changes(spark, dir, 1, 2, Seq("id"))
      .select($"id", $"p", $"_change_type").as[(Long, Long, String)]
      .collect().toSet
    assert(rows == Set((8L, 0L, "update_preimage"), (8L, 5L, "update_postimage")))
    // without the key the same window still shows the partition move
    val keyless = TableLog.changes(spark, dir, 1, 2)
      .select($"p", $"_change_type").as[(Long, String)].collect().toSet
    assert(keyless == Set((0L, "update_preimage"), (5L, "update_postimage")))
  }

  test("copy-on-write upsert pairs rewritten rows by key; compaction and " +
    "ALTER emit nothing (dataChange=false)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chg_cow").toString
    TableLog.append(spark, dir,
      spark.range(0, 20).select($"id", ($"id" * 2).as("v")).coalesce(1)) // v1
    TableLog.upsert(spark, dir,
      Seq((3L, -3L), (99L, -99L)).toDF("id", "v"), Seq("id"))           // v2
    val f = feed(dir, 1, 2, Seq("id"))
    // the cow rewrite re-writes the whole 20-row file, but key pairing
    // SUPPRESSES the 19 carried-unchanged rows (Delta CDF emits only
    // actually-changed rows): exactly one update pair survives
    assert(f((2L, "insert")) == 1L)          // 99 is new
    assert(!f.contains((2L, "delete")))      // no key vanished
    assert(f((2L, "update_preimage")) == 1L)
    assert(f((2L, "update_postimage")) == 1L)
    // value check on the real update
    val upd = TableLog.changes(spark, dir, 1, 2, Seq("id"))
      .filter($"id" === 3L).select($"_change_type", $"v")
      .as[(String, Long)].collect().toSet
    assert(upd == Set(("update_preimage", 6L), ("update_postimage", -3L)))
    TableLog.compact(spark, dir, targetBytes = 1L << 30)                // v3
    TableLog.alterSchema(spark, dir)(s => s)                            // v4
    assert(TableLog.changes(spark, dir, 2, 4, Seq("id")).count() == 0)
  }

  test("equality-delete commit surfaces matching pre-images as deletes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chg_eq").toString
    TableLog.append(spark, dir,
      spark.range(0, 30).select($"id", ($"id" % 10).as("u")).coalesce(1)) // v1
    TableLog.deleteKeys(spark, dir, Seq(4L).toDF("u"))                    // v2
    val f = feed(dir, 1, 2, Seq("id"))
    assert(f == Map((2L, "delete") -> 3L), f)
    // an append AFTER the eq-delete whose rows match the standing key is
    // not visible to read() — so it must not surface as inserts either
    TableLog.append(spark, dir,
      Seq((100L, 4L), (101L, 5L)).toDF("id", "u").coalesce(1))            // v3
    assert(feed(dir, 2, 3, Seq("id")) == Map((3L, "insert") -> 1L))
    assert(TableLog.changes(spark, dir, 2, 3, Seq("id"))
      .select($"id").as[Long].collect().toSeq == Seq(101L))
  }

  test("restore post-images honor the restored dv sidecars (hidden rows " +
    "were never inserts)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chg_rst").toString
    TableLog.append(spark, dir,
      spark.range(0, 20).select($"id", ($"id" * 2).as("v")).coalesce(1)) // v1
    TableLog.deleteWhereDv(spark, dir, $"id" < 5)                        // v2: 15 visible
    TableLog.overwrite(spark, dir,
      spark.range(100, 103).select($"id", lit(0L).as("v")).coalesce(1))  // v3
    TableLog.restore(spark, dir, 2L)                                     // v4
    val f = feed(dir, 3, 4, Seq("id"))
    // the restore re-adds v2's file TOGETHER with its dv: only the 15
    // rows visible at v2 are inserts — not the 5 dv-hidden ones
    assert(f == Map((4L, "delete") -> 3L, (4L, "insert") -> 15L), f)
  }

  test("wide 200-commit append window batches into one scan per schema " +
    "era (plan stays O(1) in commits), version stamps exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chg_wide").toString
    (1 to 100).foreach(i => TableLog.append(spark, dir,
      Seq((i.toLong, i * 2L)).toDF("id", "v").coalesce(1)))        // v1..v100
    TableLog.upsert(spark, dir,
      Seq((50L, -1L)).toDF("id", "v"), Seq("id"))                  // v101: DML
    TableLog.alterSchema(spark, dir)(s =>                          // v102: era split
      org.apache.spark.sql.types.StructType(s.fields :+
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType)))
    (101 to 199).foreach(i => TableLog.append(spark, dir,
      Seq((i.toLong, i * 2L, i * 3L)).toDF("id", "v", "w").coalesce(1)))
    val tip = TableLog.versions(spark, dir).last                   // v201
    val df = TableLog.changes(spark, dir, 0, tip, Seq("id"))
    // plan compactness: ~199 insert commits collapse into 2 era scans +
    // the DML commit's own branches — NOT one scan per commit
    val leaves = df.queryExecution.logical.collectLeaves().size
    assert(leaves < 25, s"expected batched plan, got $leaves leaf scans")
    val byType = df.groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") == 199L, byType)
    assert(byType("update_preimage") == 1L && byType("update_postimage") == 1L)
    // every append version stamped exactly once, with its own row
    val stamps = df.filter($"_change_type" === "insert")
      .groupBy($"_commit_version").count().collect()
    assert(stamps.length == 199 && stamps.forall(_.getLong(1) == 1L))
    val r42 = df.filter($"_commit_version" === 42L)
      .select($"id", $"v").as[(Long, Long)].head()
    assert(r42 == ((42L, 84L)))
    // post-era rows carry the added column; pre-era rows read null
    assert(df.filter($"_commit_version" === 150L).select($"w")
      .as[Option[Long]].head().isDefined)
  }

  test("changes() refuses a window below the earliest retained version " +
    "(vacuumed) with retention advice, up front") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chg_vac").toString
    (1 to 6).foreach(i => TableLog.append(spark, dir,
      Seq((i.toLong, i.toLong)).toDF("id", "v").coalesce(1)))      // v1..v6
    TableLog.vacuum(spark, dir, keepVersions = 3, retainMs = 0L)   // keep v4..v6
    val e = intercept[IllegalArgumentException] {
      TableLog.changes(spark, dir, 0, 6, Seq("id"))
    }
    assert(e.getMessage.contains("vacuum") &&
      e.getMessage.contains("keepVersions"), e.getMessage)
    // a window fully inside retention still serves
    assert(TableLog.changes(spark, dir, 4, 6, Seq("id")).count() == 2L)
  }

  test("noChangeOps is an exact op-token match: a data-changing op that " +
    "merely shares a prefix is NOT skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chg_tok").toString
    TableLog.append(spark, dir,
      spark.range(0, 7).select($"id", $"id".as("v")).coalesce(1))        // v1
    TableLog.append(spark, dir,
      spark.range(7, 10).select($"id", $"id".as("v")).coalesce(1))       // v2
    // rewrite v2's #op= token to a HYPOTHETICAL data-changing op whose
    // name extends a no-change token ("alter_x" vs "alter"): prefix
    // matching would silently drop its change rows
    val log = java.nio.file.Paths.get(dir, "_graft_log")
    val v2 = java.nio.file.Files.list(log).iterator().asScala
      .filter(_.getFileName.toString.startsWith("00000000000000000002")).next()
    val edited = new String(java.nio.file.Files.readAllBytes(v2), "UTF-8")
      .replace("#op=append", "#op=alter_x")
    java.nio.file.Files.write(v2, edited.getBytes("UTF-8"))
    assert(feed(dir, 1, 2, Seq("id")) == Map((2L, "insert") -> 3L))
    // the EXACT token (argument list stripped) still skips: "alter(...)"
    val edited2 = edited.replace("#op=alter_x", "#op=alter(add col)")
    java.nio.file.Files.write(v2, edited2.getBytes("UTF-8"))
    assert(TableLog.changes(spark, dir, 1, 2, Seq("id")).count() == 0)
  }
}
