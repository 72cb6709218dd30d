package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("funnel stages are monotonically shrinking and strictly ordered") {
    val rows = BehaviorOps.funnel(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val ns = rows.map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), ns.mkString(","))
    assert(ns(0) > 0)
    // conversion percents are against the PREVIOUS stage, in (0, 100]
    rows.drop(1).foreach(r => assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 100))
  }

  test("cohort retention: offset-0 counts cover every user exactly once") {
    val rows = BehaviorOps.cohortRetention(spark, sf).collect()
    val day0 = rows.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = graft.core.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(day0 == users, s"$day0 != $users")
    assert(rows.forall(_.getInt(1) >= 0))
  }

  test("gap-fill produces the complete spine with real zero-gaps and non-null LOCF") {
    val rows = BehaviorOps.gapFill(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct
    val days = rows.map(_.getString(1)).distinct
    assert(rows.length == types.length * days.length, "spine incomplete")
    assert(rows.exists(_.getLong(2) == 0L), "no gaps — the fill proved nothing")
    assert(rows.forall(!_.isNullAt(3)), "LOCF left a null")
    // LOCF carries the last observed value across a gap: for each type,
    // a zero-count day after the first observation repeats the prior value
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { series =>
      val sorted = series.sortBy(_.getString(1))
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          if (cur.getLong(2) == 0 && prev.getDouble(3) != 0.0)
            assert(cur.getDouble(3) == prev.getDouble(3),
              s"LOCF broke at ${cur.getString(0)}/${cur.getString(1)}")
        case _ => ()
      }
    }
  }

  test("transition matrix: probabilities sum to 1 per prev state; counts cover all non-first events") {
    val rows = BehaviorOps.transitionMatrix(spark, sf).collect()
    val byPrev = rows.groupBy(_.getString(0))
    byPrev.foreach { case (prev, rs) =>
      val pctSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pctSum - 1.0) < 0.01, s"$prev pct sum $pctSum")
    }
    val nTransitions = rows.map(_.getLong(2)).sum
    val ev = graft.core.Tables.events(spark, sf)
    val nUsers = ev.select(org.apache.spark.sql.functions.col("user_id")).distinct().count()
    assert(nTransitions == ev.count() - nUsers, "each user contributes (events-1) transitions")
  }
}
