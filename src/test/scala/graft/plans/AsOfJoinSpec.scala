package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native as-of join ([[AsOfJoinExec]]): semantics vs the composed
  * union+window form, tie/strict/null/empty edges on a hand-computed
  * fixture, and the plan-shape contract (custom exec node present, exactly
  * one exchange per side, partitioning reusable downstream).
  */
class AsOfJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  /** (key, time, payload) fixture with a duplicate-timestamp tie (b: two
    * purchases at 10:00), an exact-equality boundary (a: click at the same
    * instant as a purchase), a key with no right rows (c), and an
    * out-of-range-early click (a at 08:00).
    */
  private def fixture: (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val left = Seq(
      ("a", ts("2024-01-01 08:00:00"), 1L),
      ("a", ts("2024-01-01 10:00:00"), 2L),
      ("a", ts("2024-01-01 11:00:00"), 3L),
      ("b", ts("2024-01-01 10:30:00"), 4L),
      ("c", ts("2024-01-01 09:00:00"), 5L)
    ).toDF("k", "t", "click_id")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), 100L, 10.0),
      ("b", ts("2024-01-01 10:00:00"), 200L, 20.0),
      ("b", ts("2024-01-01 10:00:00"), 201L, 21.0), // tie on t: 201 must win
      ("b", ts("2024-01-01 12:00:00"), 202L, 22.0)
    ).toDF("k", "t", "p_id", "v")
    (left, right)
  }

  private def run(strict: Boolean,
      broadcast: Option[Boolean] = None): Map[Long, (Option[Long], Option[Double])] = {
    val (l, r) = fixture
    AsOfJoin(l, r, on = Seq("k"), leftTime = "t", rightTime = "t",
        payload = Seq("p_id", "v"), tieBreak = Seq("p_id"), strict = strict,
        broadcast = broadcast)
      .collect()
      .map(row => row.getAs[Long]("click_id") -> ((
        Option(row.getAs[java.lang.Long]("p_id")).map(_.toLong),
        Option(row.getAs[java.lang.Double]("v")).map(_.toDouble))))
      .toMap
  }

  test("fixture: boundary inclusion, duplicate-ts tie-break, missing key") {
    for (bc <- Seq(Some(false), Some(true))) {
      val got = run(strict = false, broadcast = bc)
      assert(got(1L) == ((None, None)), bc)                // before any purchase
      assert(got(2L) == ((Some(100L), Some(10.0))), bc)    // equal ts matches (<=)
      assert(got(3L) == ((Some(100L), Some(10.0))), bc)    // carry forward
      assert(got(4L) == ((Some(201L), Some(21.0))), bc)    // tie → max p_id
      assert(got(5L) == ((None, None)), bc)                // key with no purchases
    }
  }

  test("strict mode excludes the equal-timestamp row (both physical forms)") {
    for (bc <- Seq(Some(false), Some(true))) {
      val got = run(strict = true, broadcast = bc)
      assert(got(2L) == ((None, None)), bc)                // 10:00 < 10:00 is false
      assert(got(3L) == ((Some(100L), Some(10.0))), bc)
      assert(got(4L) == ((Some(201L), Some(21.0))), bc)
    }
  }

  test("empty right side leaves every left row null-extended") {
    val (l, r) = fixture
    for (bc <- Seq(Some(false), Some(true))) {
      val out = AsOfJoin(l, r.filter(lit(false)), on = Seq("k"),
        leftTime = "t", rightTime = "t", payload = Seq("v"), broadcast = bc)
      assert(out.count() == 5)
      assert(out.filter(col("v").isNotNull).count() == 0)
    }
  }

  test("native operator equals the composed union+window form on events") {
    val composed = graft.queries.JoinOps.asofJoin(spark, sf).collect().toSeq
    val native = graft.queries.JoinOps.asofNative(spark, sf)
      .drop("purchase_event_id").collect().toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("plan: AsOfJoinExec node, one exchange per side, no window/union") {
    val (l, r) = fixture
    val df = AsOfJoin(
      l.repartition(4), r.repartition(4), on = Seq("k"),
      leftTime = "t", rightTime = "t", payload = Seq("v"),
      broadcast = Some(false))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Union"), plan)
    // two hash exchanges (one per side) cluster the sides on the key
    val hashEx = plan.linesIterator
      .count(ln => ln.contains("Exchange hashpartitioning"))
    assert(hashEx == 2, plan)
  }

  test("downstream per-key aggregation reuses the as-of partitioning") {
    val (l, r) = fixture
    val df = AsOfJoin(l, r, on = Seq("k"), leftTime = "t", rightTime = "t",
        payload = Seq("v"), broadcast = Some(false))
      .groupBy("k").agg(sum("v").as("sv"))
    val plan = df.queryExecution.executedPlan.toString
    // outputPartitioning = hash(k) flows through, so the groupBy adds NO
    // third exchange: 2 total (left side, right side).
    val hashEx = plan.linesIterator
      .count(ln => ln.contains("Exchange hashpartitioning"))
    assert(hashEx == 2, plan)
    assert(df.collect().map(row => row.getString(0)).sorted.toSeq ==
      Seq("a", "b", "c"))
  }

  test("broadcast form: BroadcastExchange on the right, ZERO exchanges on the left") {
    val (l, r) = fixture
    val df = AsOfJoin(l.repartition(4), r, on = Seq("k"),
      leftTime = "t", rightTime = "t", payload = Seq("v"),
      broadcast = Some(true))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.linesIterator.exists(ln => ln.contains("Sort ")), plan)
  }

  test("auto selection: tiny right side broadcasts, threshold off shuffles") {
    val (l, r) = fixture
    val auto = AsOfJoin(l, r, on = Seq("k"), leftTime = "t", rightTime = "t",
      payload = Seq("v"))
    assert(auto.queryExecution.executedPlan.toString
      .contains("BroadcastAsOfJoin"))
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = AsOfJoin(l, r, on = Seq("k"), leftTime = "t",
        rightTime = "t", payload = Seq("v"))
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastAsOfJoin"), plan)
      assert(plan.contains("AsOfJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("optimizer rule: left + key predicates reach BOTH parquet scans") {
    val ev = graft.core.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val df = AsOfJoin(clicks, purchases, on = Seq("user_id"),
        leftTime = "ts", rightTime = "ts", payload = Seq("value"),
        broadcast = Some(false))
      .filter(col("user_id") < 50)
    // result correctness: same as filtering the left input first
    val pre = AsOfJoin(clicks.filter(col("user_id") < 50), purchases,
      on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"), broadcast = Some(false))
    assert(df.orderBy("event_id").collect().toSeq ==
      pre.orderBy("event_id").collect().toSeq)
    // plan: the key predicate is cloned to the right side and pushed into
    // both parquet scans
    val scans = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PushedFilters")).toSeq
    assert(scans.size == 2, scans.mkString("\n"))
    assert(scans.forall(_.contains("LessThan(user_id,50)")), scans.mkString("\n"))
  }

  test("optimizer rule: projection above the join prunes the left scan") {
    val ev = graft.core.Tables.events(spark, sf) // all 6 columns
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("p_value"))
    val df = AsOfJoin(ev.filter(col("event_type") === "click"), purchases,
        on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("p_value"), broadcast = Some(false))
      .select(col("event_id"), col("p_value"))
    val leftScan = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("ReadSchema")).toSeq.head
    // props/event_type never survive to the left read schema: the custom
    // node no longer blocks column pruning
    assert(!leftScan.contains("props"), leftScan)
    assert(df.count() > 0)
  }

  test("forward direction: first right row at-or-after, min tie-break") {
    val s0 = spark
    import s0.implicits._
    val (l, r) = fixture
    for (bc <- Seq(Some(false), Some(true))) {
      val got = AsOfJoin(l, r, on = Seq("k"), leftTime = "t", rightTime = "t",
          payload = Seq("p_id"), tieBreak = Seq("p_id"),
          direction = "forward", broadcast = bc)
        .collect().map(row => row.getAs[Long]("click_id") ->
          Option(row.getAs[java.lang.Long]("p_id")).map(_.toLong)).toMap
      assert(got(1L) == Some(100L), bc)  // 08:00 → next is 10:00
      assert(got(2L) == Some(100L), bc)  // equal instant matches forward too
      assert(got(3L) == None, bc)        // 11:00: no later purchase for a
      assert(got(4L) == Some(202L), bc)  // b@10:30 → 12:00 row
      // strict forward: the equal-instant row is excluded
      val s = AsOfJoin(l, r, on = Seq("k"), leftTime = "t", rightTime = "t",
          payload = Seq("p_id"), tieBreak = Seq("p_id"),
          direction = "forward", strict = true, broadcast = bc)
        .collect().map(row => row.getAs[Long]("click_id") ->
          Option(row.getAs[java.lang.Long]("p_id")).map(_.toLong)).toMap
      assert(s(2L) == None, bc)
      // forward ties at the same instant pick the SMALLEST tie-break
      val fwdTie = AsOfJoin(
        l.filter(col("click_id") === 4L), r, on = Seq("k"),
        leftTime = "t", rightTime = "t", payload = Seq("p_id"),
        tieBreak = Seq("p_id"), direction = "forward", strict = true,
        broadcast = bc)
      // b@10:30 strict-forward → 12:00 row (202); now from 09:00 the two
      // 10:00 ties → 200 (min), not 201
      val fromNine = AsOfJoin(
        Seq(("b", ts("2024-01-01 09:00:00"), 9L)).toDF("k", "t", "click_id"),
        r, on = Seq("k"), leftTime = "t", rightTime = "t",
        payload = Seq("p_id"), tieBreak = Seq("p_id"),
        direction = "forward", broadcast = bc)
      assert(fromNine.collect().head.getAs[java.lang.Long]("p_id") == 200L, bc)
      assert(fwdTie.collect().head.getAs[java.lang.Long]("p_id") == 202L, bc)
    }
  }

  test("nearest direction: closer side wins, equidistant resolves backward") {
    val s = spark
    import s.implicits._
    val l = Seq(
      ("x", ts("2024-01-01 10:00:00"), 1L), // equidistant between 09 and 11
      ("x", ts("2024-01-01 10:30:00"), 2L), // closer to 11
      ("x", ts("2024-01-01 08:00:00"), 3L), // before all → forward only
      ("y", ts("2024-01-01 10:00:00"), 4L)  // no right rows
    ).toDF("k", "t", "click_id")
    val r = Seq(
      ("x", ts("2024-01-01 09:00:00"), 9L),
      ("x", ts("2024-01-01 11:00:00"), 11L)
    ).toDF("k", "t", "p_id")
    for (bc <- Seq(Some(false), Some(true))) {
      val got = AsOfJoin(l, r, on = Seq("k"), leftTime = "t", rightTime = "t",
          payload = Seq("p_id"), tieBreak = Seq("p_id"),
          direction = "nearest", broadcast = bc)
        .collect().map(row => row.getAs[Long]("click_id") ->
          Option(row.getAs[java.lang.Long]("p_id")).map(_.toLong)).toMap
      assert(got(1L) == Some(9L), bc)   // tie → backward
      assert(got(2L) == Some(11L), bc)
      assert(got(3L) == Some(9L), bc)   // only forward exists
      assert(got(4L) == None, bc)
      // tolerance: 90 minutes in micros — click 3 (08:00) is 60min from
      // 09:00 → still matches; shrink to 30min → null
      val tol30 = AsOfJoin(l, r, on = Seq("k"), leftTime = "t",
          rightTime = "t", payload = Seq("p_id"), tieBreak = Seq("p_id"),
          direction = "nearest", tolerance = Some(30L * 60 * 1000000),
          broadcast = bc)
        .collect().map(row => row.getAs[Long]("click_id") ->
          Option(row.getAs[java.lang.Long]("p_id")).map(_.toLong)).toMap
      assert(tol30(3L) == None, bc)
      assert(tol30(2L) == Some(11L), bc) // 30min exactly: inclusive
    }
  }

  test("tolerance bounds backward matches (both physical forms)") {
    val (l, r) = fixture
    for (bc <- Seq(Some(false), Some(true))) {
      // click a@11:00 is 60min after the 10:00 purchase; tol=30min → null
      val got = AsOfJoin(l, r, on = Seq("k"), leftTime = "t", rightTime = "t",
          payload = Seq("p_id"), tieBreak = Seq("p_id"),
          tolerance = Some(30L * 60 * 1000000), broadcast = bc)
        .collect().map(row => row.getAs[Long]("click_id") ->
          Option(row.getAs[java.lang.Long]("p_id")).map(_.toLong)).toMap
      assert(got(3L) == None, bc)
      assert(got(2L) == Some(100L), bc) // distance 0 passes any tolerance
    }
  }

  test("broadcast equals sort-merge on the sf0.001 events self-as-of") {
    val ev = graft.core.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"), col("value"))
    def side(bc: Boolean) =
      AsOfJoin(clicks, purchases, on = Seq("user_id"), leftTime = "ts",
        rightTime = "ts", payload = Seq("value", "p_id"),
        tieBreak = Seq("p_id"), broadcast = Some(bc))
        .orderBy("event_id").collect().toSeq
    assert(side(true) == side(false))
  }
}
