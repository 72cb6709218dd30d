package graft.core

import org.apache.spark.sql.functions._

/** Diagnose the sf3 ngram-Jaccard off-by-one: recompute the exact pair
  * set with a RELAXED size prefilter (threshold lowered below the
  * rounding slack), apply the rounded >= 0.3 output filter, and diff
  * against a previously dumped result.
  * Run: sbt "Test/runMain graft.core.NgramEdgeProbe <sfDir> <dumpDir>"
  */
object NgramEdgeProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, dumpDir) = args.take(2)
    val spark = graft.core.Session.local()
    def corpusNear = {
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("text"))
      val toks = graft.ops.TextAnalysis.tokens(col("text"))
      val trunc = array_join(
        slice(toks, lit(1), greatest(size(toks) - 5, lit(3))), " ")
      docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("lang"),
            trunc.as("text")))
    }
    val exact = graft.ops.Dedup.ngramJaccardPairs(corpusNear,
      "doc_id", "text", blockCols = Seq("lang"), shingleN = 3,
      minJaccard = 0.29)
      .filter(col("jaccard") >= 0.3)
    val dumped = spark.read.parquet(dumpDir)
    val missing = exact.join(dumped, Seq("id_a", "id_b"), "left_anti")
    val extra = dumped.join(exact, Seq("id_a", "id_b"), "left_anti")
    println("MISSING_FROM_DUMP:")
    missing.show(20, truncate = false)
    println("EXTRA_IN_DUMP:")
    extra.show(20, truncate = false)
    // sizes for the missing pairs to classify prefilter-vs-recall
    val base = corpusNear
      .select(col("doc_id"),
        size(array_distinct(call_function("graft_shingles", col("text"),
          lit(3)))).as("n_sh"))
    missing
      .join(base.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(base.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("min_over_max",
        least(col("n_a"), col("n_b")).cast("double") /
          greatest(col("n_a"), col("n_b")))
      .show(20, truncate = false)
    spark.stop()
  }
}
