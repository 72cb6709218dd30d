package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{TextAnalysis => TA}

/** Statistical language-model scoring over the corpus — the KenLM role in
  * a training-data pipeline: an add-k-smoothed bigram model trained on the
  * corpus itself scores every document's cross-entropy, and the outliers
  * (high = unlike the corpus, low = boilerplate/repetition) are what
  * quality filters act on.
  *
  * Scale shape: bigram counts and context counts are two hash aggregations
  * over the exploded shingle stream (map-side combined); scoring re-joins
  * the stream to those count tables on the bigram/context keys — all
  * shuffles keyed and linear, no driver-side model materialization, so the
  * "model" can be arbitrarily large (it lives as a distributed table, the
  * way a 100 TB-corpus LM must).
  *
  * Determinism: per-bigram negative log-likelihoods are rounded to integer
  * MICRO-nats before summation (the [[Num]] integer-units policy), so the
  * per-doc sum is order-independent and bit-identical across engines and
  * cluster sizes.
  */
object LmOps {

  type Q = (SparkSession, String) => DataFrame

  /** Per-doc bigram stream: one row per bigram OCCURRENCE (duplicates kept
    * — each occurrence contributes to both training counts and the doc's
    * own score, the standard held-in perplexity proxy).
    */
  private def bigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      explode(call_function("graft_shingles", col("text"), lit(2))).as("bg"))

  /** Top-15 documents by add-0.5-smoothed bigram cross-entropy
    * (nats/bigram): P(w2|w1) = (C(w1w2)+0.5) / (C(w1·)+0.5·V).
    */
  def bigramLm: Q = (s, d) => {
    val bi = bigrams(s, d).transform(graft.core.Checkpoint.apply)
    val vocab = Tables.documents(s, d)
      .select(explode(TA.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).first().getLong(0)
    val biCounts = bi.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
    val ctxCounts = bi.select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c_ctx"))
    bi.join(biCounts, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctxCounts, "w1")
      .withColumn("nll_micro",
        round(-log((col("c_bg") + lit(0.5)) / (col("c_ctx") + lit(0.5) * vocab))
          * 1000000).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll_micro")).as("nll_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        Num.roundAt(4)(col("nll_sum").cast("double") / 1000000.0 / col("n_bigrams"))
          .as("cross_entropy"))
      .orderBy(desc("cross_entropy"), col("doc_id"))
      .limit(15)
  }

  val bigramLmSql: String =
    s"""WITH tok AS (SELECT doc_id, ${TA.tokensSql("text")} AS toks FROM documents),
      |bi AS (SELECT doc_id, unnest(${TA.shinglesSql("toks", 2)}) AS bg FROM tok),
      |v AS (SELECT count(DISTINCT t) AS v
      |  FROM (SELECT unnest(toks) AS t FROM tok)),
      |bc AS (SELECT bg, count(*) AS c_bg FROM bi GROUP BY bg),
      |cx AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c_ctx
      |  FROM bi GROUP BY 1),
      |sc AS (SELECT doc_id,
      |    CAST(round(-ln((c_bg + 0.5) / (c_ctx + 0.5 * v.v)) * 1000000) AS BIGINT) AS nm
      |  FROM bi JOIN bc USING (bg)
      |  JOIN cx ON split_part(bi.bg, ' ', 1) = cx.w1
      |  CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  ${Num.roundAtSql(4, "CAST(sum(nm) AS DOUBLE) / 1000000.0 / count(*)")} AS cross_entropy
      |FROM sc GROUP BY doc_id
      |ORDER BY cross_entropy DESC, doc_id LIMIT 15""".stripMargin

  val queries: Map[String, Q] = Map("q_bigram_lm" -> bigramLm)
  val oracles: Map[String, String] = Map("q_bigram_lm" -> bigramLmSql)
}
