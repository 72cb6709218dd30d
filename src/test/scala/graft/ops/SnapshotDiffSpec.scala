package graft.ops

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies insert/delete/update and ignores unchanged rows") {
    val oldSnap = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "s", "v")
    val newSnap = Seq((1L, "a", 10), (2L, "b", 99), (4L, "d", 40))
      .toDF("k", "s", "v")
    val feed = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(feed == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("unchanged rows with null keys do NOT produce phantom insert+delete") {
    val oldSnap = Seq((Option(1L), "a"), (Option.empty[Long], "x")).toDF("k", "s")
    val newSnap = Seq((Option(1L), "a"), (Option.empty[Long], "x")).toDF("k", "s")
    assert(SnapshotDiff.diff(oldSnap, newSnap, Seq("k")).isEmpty)
    // and a CHANGED null-key row is a single update, not two events
    val newChanged = Seq((Option(1L), "a"), (Option.empty[Long], "y")).toDF("k", "s")
    val feed = SnapshotDiff.diff(oldSnap, newChanged, Seq("k"))
      .as[(Option[Long], String)].collect()
    assert(feed.toSeq == Seq((None, "update")))
  }
}
