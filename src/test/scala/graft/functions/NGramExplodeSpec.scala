package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Generator semantics: lazy n-gram explode ≡ the materializing
  * explode(graft_shingles) composition, edge conventions included.
  */
class NGramExplodeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "a b"),
    (3L, ""),            // empty text → single "" shingle at pos 0
    (4L, "   leading  and   trailing   "),
    (5L, null.asInstanceOf[String]) // null → zero rows
  ).toDF("doc_id", "text")

  test("generator equals the materializing explode(graft_shingles) form") {
    val gen = docs
      .select($"doc_id", expr("graft_ngram_explode(text, 3)"))
      .select($"doc_id", $"pos", $"shingle")
    val composed = docs.filter($"text".isNotNull)
      .select($"doc_id",
        posexplode(expr("graft_shingles(text, 3)")).as(Seq("pos", "shingle")))
    assert(gen.orderBy("doc_id", "pos").collect().toSeq ==
      composed.orderBy("doc_id", "pos").collect().toSeq)
  }

  test("edge conventions: empty text, short text, null text") {
    val out = docs
      .select($"doc_id", expr("graft_ngram_explode(text, 3)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.count(_._1 == 3L) == 1 && out.find(_._1 == 3L).get._3 == "")
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq("a b")) // < n tokens
    assert(!out.exists(_._1 == 5L))                              // null text
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(
      "the quick brown", "quick brown fox", "brown fox jumps"))
  }

  test("plan runs the generator directly — no intermediate array expression") {
    val df = docs.select($"doc_id", expr("graft_ngram_explode(text, 2)"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate graft_ngram_explode"), plan)
    assert(!plan.contains("graft_shingles"), plan)
  }
}
