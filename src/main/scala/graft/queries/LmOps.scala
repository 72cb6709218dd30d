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

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data"): every doc is
    * scored by the corpus bigram LM, the score distribution is cut into
    * terciles, and docs land in head (most fluent) / middle / tail —
    * the buckets CCNet keeps, mixes, or drops.
    *
    * Scale shape: the per-doc score is the same two hash-aggregations +
    * keyed re-join as [[bigramLm]] (no global structure). The tercile
    * CUTOFFS are order statistics — computed WITHOUT a per-doc global sort
    * by aggregating to one row per DISTINCT integer micro-nat score and
    * running the one cumulative window over that bounded set (score range
    * ≤ ~10^7 values regardless of corpus size — the same distinct-domain
    * window bound as q_eval_auc), then broadcasting the two-value cutoff
    * row back. Per-doc bucketing is a broadcast-join comparison: at
    * billions of docs nothing but the distinct-score table ever sits on
    * one partition.
    *
    * Determinism: scores are integer micro-nats (per-occurrence NLL
    * rounded to micro, summed, divided by bigram count, rounded); cutoff
    * ties go to the lower bucket on both engines.
    */
  def perplexityFilter: Q = (s, d) => {
    val bi = bigrams(s, d).transform(graft.core.Checkpoint.apply)
    val vocab = Tables.documents(s, d)
      .select(explode(TA.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).first().getLong(0)
    val biCounts = bi.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
    val ctxCounts = bi.select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c_ctx"))
    val doc = bi.join(biCounts, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctxCounts, "w1")
      .withColumn("nll_micro",
        round(-log((col("c_bg") + lit(0.5)) / (col("c_ctx") + lit(0.5) * vocab))
          * 1000000).cast("long"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("nll_micro")).cast("double") / count(lit(1)))
        .cast("long").as("ce"))
      .transform(graft.core.Checkpoint.apply)
    val n = doc.count()
    val cum = doc.groupBy(col("ce")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ce"))
          .rowsBetween(Long.MinValue, 0)))
    val cuts = cum.agg(
      min(when(col("cum") >= math.ceil(n / 3.0).toLong, col("ce"))).as("t1"),
      min(when(col("cum") >= math.ceil(2 * n / 3.0).toLong, col("ce"))).as("t2"))
    doc.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("ce") <= col("t1"), "head")
          .when(col("ce") <= col("t2"), "middle")
          .otherwise("tail"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("ce")).as("ce_min_micro"),
        max(col("ce")).as("ce_max_micro"),
        Num.roundAt(4)(sum(col("ce")).cast("double") / count(lit(1)) / 1000000.0)
          .as("ce_avg"))
      .orderBy(col("bucket"))
  }

  val perplexityFilterSql: String =
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
      |  CROSS JOIN v),
      |doc AS (SELECT doc_id,
      |    CAST(round(CAST(sum(nm) AS DOUBLE) / count(*)) AS BIGINT) AS ce
      |  FROM sc GROUP BY doc_id),
      |n AS (SELECT count(*) AS n FROM doc),
      |dist AS (SELECT ce, count(*) AS c FROM doc GROUP BY ce),
      |cum AS (SELECT ce, sum(c) OVER (ORDER BY ce
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM dist),
      |cuts AS (SELECT
      |    min(CASE WHEN cum >= ceil(n.n / 3.0) THEN ce END) AS t1,
      |    min(CASE WHEN cum >= ceil(2 * n.n / 3.0) THEN ce END) AS t2
      |  FROM cum CROSS JOIN n),
      |b AS (SELECT doc_id, ce,
      |    CASE WHEN ce <= t1 THEN 'head'
      |         WHEN ce <= t2 THEN 'middle' ELSE 'tail' END AS bucket
      |  FROM doc CROSS JOIN cuts)
      |SELECT bucket, count(*) AS n_docs,
      |  min(ce) AS ce_min_micro, max(ce) AS ce_max_micro,
      |  ${Num.roundAtSql(4, "CAST(sum(ce) AS DOUBLE) / count(*) / 1000000.0")} AS ce_avg
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_bigram_lm" -> bigramLm,
    "q_perplexity_filter" -> perplexityFilter)
  val oracles: Map[String, String] = Map(
    "q_bigram_lm" -> bigramLmSql,
    "q_perplexity_filter" -> perplexityFilterSql)
}
