package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis => TA}
import graft.queries.TrainPrepOps

/** The full training-corpus pipeline composed end-to-end on real documents:
  * quality gate → exact dedup → near-dup clustering → canonical survivor
  * selection → hash split → token packing. Each stage is individually
  * oracle-gated; this spec pins that they COMPOSE (counts reconcile at every
  * step, no doc is lost or duplicated).
  */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("filter -> dedup -> cluster -> split -> pack composes losslessly") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text")
    // plant exact dups + near-dups so both dedup stages have work
    val corpus = docs
      .unionByName(docs.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 100000).as("doc_id"), $"lang", $"text"))
      .unionByName(docs.filter($"doc_id" % 13 === 0)
        .select(($"doc_id" + 200000).as("doc_id"), $"lang",
          array_join(slice(TA.tokens($"text"), lit(1),
            greatest(size(TA.tokens($"text")) - 5, lit(3))), " ").as("text")))
      .cache()
    val n0 = corpus.count()

    // 1. quality gate (same thresholds as q_quality_filter)
    val toks = TA.tokens($"text")
    val kept = corpus
      .withColumn("n_tokens", size(toks))
      .filter($"n_tokens".between(20, 2000) &&
        TA.punctRatio($"text") <= 0.10 && TA.stopwordRatio(toks) >= 0.01)
      .cache()
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup: keep min doc_id per content hash
    val survivors = kept.withColumn("h", md5($"text"))
      .withColumn("keep", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"h")))
      .filter($"doc_id" === $"keep").drop("h", "keep").cache()
    val n2 = survivors.count()
    // the planted exact copies of kept docs must be gone
    assert(n2 < n1)
    assert(survivors.select($"text").distinct().count() == n2)

    // 3. near-dup clusters -> keep component minimum
    val pairs = Dedup.ngramJaccardPairs(survivors, "doc_id", "text",
      blockCols = Seq("lang"), shingleN = 3, minJaccard = 0.5)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val dupDrop = cc.filter($"node" =!= $"component").select($"node".as("doc_id"))
    val canonical = survivors.join(dupDrop, Seq("doc_id"), "left_anti").cache()
    val n3 = canonical.count()
    assert(n3 == n2 - dupDrop.count())

    // 4. deterministic split: partitions the corpus exactly
    val withSplit = canonical.withColumn("bucket",
      conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10).cast("long") % 100)
    val train = withSplit.filter($"bucket" < 90)
    val rest = withSplit.filter($"bucket" >= 90)
    assert(train.count() + rest.count() == n3)

    // 5. pack the train split; every doc lands in exactly one chunk
    val packed = TrainPrepOps.tokenPacking(spark, sf) // shape check on raw table
    assert(packed.columns.toSeq ==
      Seq("lang", "chunk_id", "n_docs", "chunk_tokens", "first_doc", "last_doc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"doc_id")
    val trainPacked = train
      .withColumn("prefix", sum($"n_tokens".cast("long")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)) - $"n_tokens")
      .withColumn("chunk_id", floor($"prefix" / 4096))
    assert(trainPacked.count() == train.count())
    val chunkTotals = trainPacked.groupBy($"lang", $"chunk_id")
      .agg(sum($"n_tokens").as("t"))
    // chunks fill to the budget: every non-final chunk holds > 4096/2 tokens
    val small = chunkTotals.join(
      chunkTotals.groupBy($"lang").agg(max($"chunk_id").as("last")), "lang")
      .filter($"chunk_id" =!= $"last" && $"t" <= 2048)
    assert(small.isEmpty)
    corpus.unpersist(); kept.unpersist(); survivors.unpersist(); canonical.unpersist()
  }
}
