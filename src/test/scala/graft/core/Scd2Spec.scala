package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SCD2 invariants ported from the reference's unit tests
  * (tests/unit/test_scd_type2.py) plus merge-scenario cases the reference
  * leaves untested: change-close-insert, unchanged passthrough, new-key
  * insert, same-day rerun re-insert, null business keys.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val t0 = ScdClock.fixed("2024-01-15")
  private val t1 = ScdClock.fixed("2024-06-01")
  private val bk = Seq("id")
  private val tracked = Seq("name", "seg")

  private def snap(rows: (Int, String, String)*): DataFrame =
    rows.toDF("id", "name", "seg")

  private def merge(target: Option[DataFrame], staged: DataFrame,
                    clock: ScdClock): DataFrame =
    Scd2.applyScdType2Merge(target, staged, bk, tracked, clock)

  test("initial load: all rows current, end_date null, keys non-null") {
    val out = merge(None, snap((1, "a", "X"), (2, "b", "Y")), t0).cache()
    assert(out.count() == 2)
    assert(out.filter(!col("is_current")).count() == 0)
    assert(out.filter(col("end_date").isNotNull).count() == 0)
    assert(out.filter(col("surrogate_key").isNull || col("row_hash").isNull).count() == 0)
    assert(out.select(col("effective_date").cast("string")).distinct().as[String].collect()
      .sameElements(Array("2024-01-15")))
  }

  test("changed row is closed and re-inserted; unchanged passes through") {
    val initial = merge(None, snap((1, "a", "X"), (2, "b", "Y")), t0)
    val out = merge(Some(initial), snap((1, "a", "CHANGED"), (2, "b", "Y")), t1).cache()
    // key 1: closed historical + new current; key 2: untouched original
    assert(out.count() == 3)
    val k1 = out.filter($"id" === 1).orderBy("effective_date")
      .select($"seg", $"is_current", $"end_date".cast("string"))
      .as[(String, Boolean, Option[String])].collect()
    assert(k1 === Array(("X", false, Some("2024-06-01")), ("CHANGED", true, None)))
    val k2 = out.filter($"id" === 2)
      .select($"seg", $"is_current", $"effective_date".cast("string"))
      .as[(String, Boolean, String)].collect()
    assert(k2 === Array(("Y", true, "2024-01-15")))
  }

  test("new business key inserts without touching others") {
    val initial = merge(None, snap((1, "a", "X")), t0)
    val out = merge(Some(initial), snap((1, "a", "X"), (3, "c", "Z")), t1).cache()
    assert(out.count() == 2)
    assert(out.filter($"id" === 3 && $"is_current" &&
      $"effective_date" === "2024-06-01").count() == 1)
  }

  test("same-day rerun re-inserts versions for keys closed today (reference edge case)") {
    val initial = merge(None, snap((1, "a", "X")), t0)
    val run1 = merge(Some(initial), snap((1, "a", "CHANGED")), t1)
    assert(run1.count() == 2)
    // rerun with identical staged data the same day: MERGE #2 matches the
    // key closed today and inserts a duplicate same-day version
    val run2 = merge(Some(run1), snap((1, "a", "CHANGED")), t1).cache()
    assert(run2.count() == 3)
    assert(run2.filter($"is_current").count() == 2)
    // ... and both same-day versions collide on the surrogate key
    assert(run2.filter($"is_current").select("surrogate_key").distinct().count() == 1)
  }

  test("null business keys never match and always insert") {
    val initial = merge(None,
      Seq((Option.empty[Int], "a", "X")).toDF("id", "name", "seg"), t0)
    val out = merge(Some(initial),
      Seq((Option.empty[Int], "a", "X")).toDF("id", "name", "seg"), t1).cache()
    // the null-key target row is unmatched (stays current) and the null-key
    // staged row is unmatched (inserts) — reference's `=` join semantics
    assert(out.count() == 2)
    assert(out.filter($"is_current").count() == 2)
  }

  test("bucketed merge: equals full merge, rewrites only affected buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd_bkt").toString
    val nb = 8
    // initial: enough keys that every bucket is populated
    val initial = snap((1 to 200).map(i => (i, s"n$i", "X")): _*)
    Scd2.mergeBucketed(spark, dir, initial, bk, tracked, t0, nBuckets = nb)
    assert(spark.read.parquet(dir).count() == 200)
    // snapshot file mtimes per bucket dir
    def fileStamps(): Map[String, Long] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("_bucket=")).flatMap { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> f.lastModified())
      }.toMap
    }
    val before = fileStamps()
    // delta touches 3 keys -> at most 3 buckets
    val delta = snap((1, "n1", "CHANGED"), (2, "n2", "CHANGED"), (201, "new", "Z"))
    val affected = delta.select(Scd2.keyBucket(bk, nb).as("b"))
      .distinct().as[Int].collect().toSet
    Scd2.mergeBucketed(spark, dir, delta, bk, tracked, t1, nBuckets = nb)
    val after = fileStamps()
    // untouched buckets keep their exact files
    val untouched = before.keySet.filter(k =>
      !affected.contains(k.split("/")(0).stripPrefix("_bucket=").toInt))
    assert(untouched.nonEmpty)
    untouched.foreach { k => assert(after.get(k).contains(before(k)), s"$k rewritten") }
    // result equals the plain full-table merge (delta only stages 3 keys,
    // so unchanged keys 3..200 pass through via the untouched partitions)
    val fullMerge = merge(Some(merge(None, initial, t0)), delta, t1)
    val bucketed = spark.read.parquet(dir).drop("_bucket")
      .select(fullMerge.columns.map(col).toIndexedSeq: _*)
    assert(bucketed.exceptAll(fullMerge).isEmpty &&
      fullMerge.exceptAll(bucketed).isEmpty)
  }

  test("mergeLogged: versioned dim on TableLog — atomic merges, time travel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scdlog").toString
    val v1 = Scd2.mergeLogged(spark, dir, snap((1, "a", "X"), (2, "b", "Y")),
      bk, tracked, t0)
    val v2 = Scd2.mergeLogged(spark, dir, snap((1, "a", "CHANGED"), (2, "b", "Y")),
      bk, tracked, t1)
    assert(v1 == 1 && v2 == 2)
    // tip: key 1 closed + re-inserted, key 2 untouched
    val tip = TableLog.read(spark, dir)
    assert(tip.count() == 3)
    assert(Scd2.currentRecords(tip).filter($"id" === 1)
      .select($"seg").as[String].head() == "CHANGED")
    // time travel: the pre-merge dimension is still a committed snapshot
    val before = TableLog.read(spark, dir, Some(1L))
    assert(before.count() == 2 &&
      before.filter(!$"is_current").count() == 0)
    // equivalence with the catalog-table merge path
    val direct = merge(Some(merge(None, snap((1, "a", "X"), (2, "b", "Y")), t0)),
      snap((1, "a", "CHANGED"), (2, "b", "Y")), t1)
    val aligned = tip.select(direct.columns.map(col).toIndexedSeq: _*)
    assert(aligned.exceptAll(direct).isEmpty && direct.exceptAll(aligned).isEmpty)
    // a failed merge commits nothing: staged missing a tracked column
    intercept[Exception] {
      Scd2.mergeLogged(spark, dir,
        Seq((9, "z")).toDF("id", "name"), bk, tracked, t1)
    }
    assert(TableLog.versions(spark, dir) == Seq(1L, 2L))
  }

  test("currentRecords / changeHistory read API") {
    val initial = merge(None, snap((1, "a", "X"), (2, "b", "Y")), t0)
    val merged = merge(Some(initial), snap((1, "a", "Z"), (2, "b", "Y")), t1)
    assert(Scd2.currentRecords(merged).count() == 2)
    val hist = Scd2.changeHistory(merged, bk, Seq(1))
      .select("seg").as[String].collect()
    assert(hist === Array("X", "Z"))
  }
}
