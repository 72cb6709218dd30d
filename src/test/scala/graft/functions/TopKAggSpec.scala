package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("graft_topk equals the window row_number form regardless of partitioning") {
    val orders = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
    def viaAgg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"o_orderpriority")
        .agg(call_function("graft_topk", $"o_totalprice", $"o_orderkey", lit(5)).as("top"))
        .select($"o_orderpriority", explode($"top").as("t"))
        .select($"o_orderpriority", $"t.payload".as("k"), $"t.value".as("v"))
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"o_orderpriority", $"o_orderkey".as("k"), $"o_totalprice".as("v"))
    // 1 partition vs 16 partitions: partial-heap merge must not change results
    for (df <- Seq(orders.coalesce(1), orders.repartition(16))) {
      val a = viaAgg(df)
      assert(a.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(a).isEmpty)
    }
  }

  test("graft_topk handles ties, nulls, and groups smaller than k") {
    val df = Seq(
      ("g1", 5.0, 10L), ("g1", 5.0, 2L), ("g1", 5.0, 7L), ("g1", 1.0, 1L),
      ("g2", 3.0, 1L)).toDF("g", "v", "p")
      .unionByName(Seq(("g1", Option.empty[Double], 99L))
        .toDF("g", "v", "p"))
    val out = df.groupBy($"g")
      .agg(call_function("graft_topk", $"v", $"p", lit(2)).as("top"))
      .select($"g", $"top".cast("string").as("s"))
      .as[(String, String)].collect().toMap
    // ties on value keep the SMALLEST payloads; null values ignored
    assert(out("g1") == "[{5.0, 2}, {5.0, 7}]")
    assert(out("g2") == "[{3.0, 1}]") // group smaller than k
  }

  test("graft_topk partially aggregates before the shuffle") {
    val plan = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy($"o_orderpriority")
      .agg(call_function("graft_topk", $"o_totalprice", $"o_orderkey", lit(3)).as("top"))
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate; the partial
    // (map-side heap) must appear below the exchange
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_graft_topk")
    assert(exchangeIdx > 0 && partialIdx > exchangeIdx, // top-down print order
      s"exchange@$exchangeIdx partial@$partialIdx")
  }

  test("graft_topk is usable from SQL") {
    graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("topk_orders_v")
    val n = spark.sql(
      """SELECT o_orderpriority, graft_topk(o_totalprice, o_orderkey, 3) AS top
        |FROM topk_orders_v GROUP BY o_orderpriority""".stripMargin).count()
    assert(n == 5)
  }
}
