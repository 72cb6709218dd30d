package graft.core

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
    // the cow rewrite re-writes the whole touched file, but key pairing
    // collapses unchanged-key rows into update pairs, not delete+insert
    assert(f((2L, "insert")) == 1L)          // 99 is new
    assert(!f.contains((2L, "delete")))      // no key vanished
    assert(f((2L, "update_preimage")) == f((2L, "update_postimage")))
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
  }
}
