package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{TextAnalysis => TA}

/** Training-corpus preparation operators: deterministic splits, quality
  * filtering with per-reason accounting, and sequence packing.
  *
  * All three are the shapes a 100 TB pre-training pipeline actually runs:
  * - splits MUST be content/key-hashed, never `rand()`: a hash split is
  *   reproducible across reruns and cluster sizes and stays stable when the
  *   corpus is re-partitioned (md5 of the key -> bucket 0-99).
  * - quality filtering is per-document and codegen'd — it rides the scan
  *   (no shuffle), so the filter rate is the only thing that matters at
  *   scale. First-failing-reason accounting gives the drop-rate dashboard.
  * - packing concatenates documents into fixed token-budget chunks. The
  *   scalable formulation is a per-shard running token total with
  *   `floor(prefix/budget)` chunk ids: one window shuffle per shard key,
  *   no sequential driver loop.
  */
object TrainPrepOps {

  type Q = (SparkSession, String) => DataFrame

  /** md5-keyed bucket in [0, mod): first 15 hex chars -> 60-bit int. */
  private def hashBucket(key: org.apache.spark.sql.Column, mod: Int = 100) =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % mod

  private def hashBucketSql(key: String, mod: Int = 100) =
    s"CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15) AS BIGINT) % $mod"

  /** Deterministic 90/5/5 train/val/test split on md5(doc_id). */
  def hashSplit: Q = (s, d) => {
    val b = hashBucket(col("doc_id"))
    Tables.documents(s, d)
      .withColumn("split",
        when(b < 90, "train").when(b < 95, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("lang"))
  }

  val hashSplitSql: String = {
    val b = hashBucketSql("doc_id")
    s"""SELECT CASE WHEN $b < 90 THEN 'train' WHEN $b < 95 THEN 'val' ELSE 'test' END AS split,
      |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
  }

  /** Quality gate with first-failing-reason accounting. Entirely scan-side:
    * one pass, no shuffle before the final rollup.
    */
  def qualityFilter: Q = (s, d) => {
    val toks = TA.tokens(col("text"))
    Tables.documents(s, d)
      .withColumn("n_tokens", size(toks))
      .withColumn("sw_ratio", TA.stopwordRatio(toks))
      .withColumn("punct", TA.punctRatio(col("text")))
      .withColumn("verdict",
        when(col("n_tokens") < 20, "drop:too_short")
          .when(col("n_tokens") > 2000, "drop:too_long")
          .when(col("punct") > 0.10, "drop:punct_heavy")
          .when(col("sw_ratio") < 0.01, "drop:no_stopwords")
          .otherwise("keep"))
      .groupBy(col("lang"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
      .orderBy(col("lang"), col("verdict"))
  }

  val qualityFilterSql: String = {
    val toks = TA.tokensSql("text")
    val swList = TA.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH scored AS (
      |  SELECT lang, len(toks) AS n_tokens,
      |    len(list_filter(toks, t -> list_contains($swList, t))) / CAST(greatest(len(toks), 1) AS DOUBLE) AS sw_ratio,
      |    len(regexp_extract_all(text, '[^\\w\\s]')) / CAST(greatest(length(text), 1) AS DOUBLE) AS punct
      |  FROM (SELECT lang, text, $toks AS toks FROM documents)),
      |verdicts AS (
      |  SELECT lang, n_tokens,
      |    CASE WHEN n_tokens < 20 THEN 'drop:too_short'
      |         WHEN n_tokens > 2000 THEN 'drop:too_long'
      |         WHEN punct > 0.10 THEN 'drop:punct_heavy'
      |         WHEN sw_ratio < 0.01 THEN 'drop:no_stopwords'
      |         ELSE 'keep' END AS verdict
      |  FROM scored)
      |SELECT lang, verdict, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM verdicts GROUP BY lang, verdict ORDER BY lang, verdict""".stripMargin
  }

  /** Sequence packing: concatenate documents per lang shard in doc_id order,
    * chunk at a 4096-token budget; a doc lands in the chunk where it starts.
    * One window shuffle on the shard key — no driver-side sequential pass.
    */
  def tokenPacking: Q = (s, d) => {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .withColumn("n_tokens", size(TA.tokens(col("text"))).cast("long"))
      .withColumn("prefix_tokens", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk_id", floor(col("prefix_tokens") / 4096).cast("long"))
      .groupBy(col("lang"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("chunk_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("chunk_id"))
  }

  val tokenPackingSql: String = {
    val toks = TA.tokensSql("text")
    s"""WITH sized AS (
      |  SELECT lang, doc_id, CAST(len($toks) AS BIGINT) AS n_tokens
      |  FROM documents),
      |pref AS (
      |  SELECT lang, doc_id, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_tokens AS prefix_tokens
      |  FROM sized)
      |SELECT lang, CAST(floor(prefix_tokens / 4096) AS BIGINT) AS chunk_id,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM pref GROUP BY 1, 2 ORDER BY lang, chunk_id""".stripMargin
  }

  /** Training-data mixture: per-source sampling rates applied with the
    * same md5 bucket as [[hashSplit]] — en 100%, de 50%, everything else
    * 10%. Hash-gated sampling (never `rand()`) keeps the mixture exactly
    * reproducible across reruns, retries, and cluster sizes, and each
    * document's fate is independent of partitioning.
    */
  def dataMixture: Q = (s, d) => {
    val b = hashBucket(col("doc_id"))
    val rate = when(col("lang") === "en", 100)
      .when(col("lang") === "de", 50)
      .otherwise(10)
    Tables.documents(s, d)
      .filter(b < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  val dataMixtureSql: String = {
    val b = hashBucketSql("doc_id")
    s"""SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE $b < CASE WHEN lang = 'en' THEN 100 WHEN lang = 'de' THEN 50 ELSE 10 END
      |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Temperature-resampled mixture weights (w_c ∝ n_c^0.7, the
    * multilingual-pretraining rebalancing rule): per language, the natural
    * token share, the temperature share, and the upweight factor a sampler
    * would apply. Two tiny aggregations + two driver scalars (the
    * pct-of-total shape) — group cardinality work only, never corpus-sized.
    *
    * Determinism: weights go through integer MICRO-units immediately after
    * the one `pow` call (exact long sums, exact divisions), so shares are
    * independent of aggregation order; shares round at 6dp on both engines.
    */
  def mixtureTemperature: Q = (s, d) => {
    val counts = Tables.documents(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_tokens"))
      .withColumn("wm",
        round(pow(col("n_tokens").cast("double"), lit(0.7)) * 1000000).cast("long"))
      .transform(graft.core.Checkpoint.apply)
    val t = counts.agg(sum(col("n_tokens")), sum(col("wm"))).first()
    val tot = t.getLong(0); val sw = t.getLong(1)
    counts.select(col("lang"), col("n_docs"), col("n_tokens"),
      Num.roundAt(6)(col("n_tokens").cast("double") / tot).as("p_natural"),
      Num.roundAt(6)(col("wm").cast("double") / sw).as("p_temperature"),
      Num.roundAt(6)((col("wm").cast("double") / sw) /
        (col("n_tokens").cast("double") / tot)).as("upweight"))
      .orderBy(col("lang"))
  }

  val mixtureTemperatureSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |w AS (SELECT lang, n_docs, n_tokens,
      |    CAST(round(power(CAST(n_tokens AS DOUBLE), 0.7) * 1000000) AS BIGINT) AS wm
      |  FROM c),
      |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
      |    CAST(sum(wm) AS BIGINT) AS sw FROM w)
      |SELECT lang, n_docs, n_tokens,
      |  ${Num.roundAtSql(6, "CAST(n_tokens AS DOUBLE) / tot")} AS p_natural,
      |  ${Num.roundAtSql(6, "CAST(wm AS DOUBLE) / sw")} AS p_temperature,
      |  ${Num.roundAtSql(6, "(CAST(wm AS DOUBLE) / sw) / (CAST(n_tokens AS DOUBLE) / tot)")} AS upweight
      |FROM w CROSS JOIN t ORDER BY lang""".stripMargin

  /** Per-language z-score outlier screen on document length — the
    * statistical quality gate that catches boilerplate floods and
    * truncated scraps a fixed threshold misses.
    *
    * Determinism discipline: population moments come from EXACT integer
    * sums (Σx, Σx² as longs — order-free), variance/mean/σ are derived
    * with one fixed formula on both engines, so even the float z-scores
    * and the outlier counts are bit-identical. (`stddev_pop` on doubles
    * would be partitioning-dependent.) Stats are a tiny broadcast back
    * onto the scan — two shuffles total at any scale.
    */
  def outlierZscore: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("lang"), col("n_chars").cast("long").as("x"))
    val stats = base.groupBy(col("lang"))
      .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        count(lit(1)).as("n"))
      .withColumn("mean", col("sx").cast("double") / col("n"))
      .withColumn("std", sqrt(
        (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n")) / col("n")))
    base.join(broadcast(stats), "lang")
      .withColumn("z", (col("x").cast("double") - col("mean")) / col("std"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(abs(col("z")) > 2.0, 1).otherwise(0)).as("n_outliers"),
        Num.roundAt(4)(max(col("mean"))).as("mean_chars"),
        Num.roundAt(4)(max(col("std"))).as("std_chars"))
      .orderBy(col("lang"))
  }

  val outlierZscoreSql: String =
    s"""WITH base AS (SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents),
      |st AS (SELECT lang,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM base GROUP BY lang),
      |s2 AS (SELECT lang, CAST(sx AS DOUBLE) / n AS mean,
      |    sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n) AS std
      |  FROM st)
      |SELECT b.lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN abs((CAST(x AS DOUBLE) - mean) / std) > 2.0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  ${Num.roundAtSql(4, "max(mean)")} AS mean_chars,
      |  ${Num.roundAtSql(4, "max(std)")} AS std_chars
      |FROM base b JOIN s2 USING (lang)
      |GROUP BY b.lang ORDER BY b.lang""".stripMargin

  /** Weight-proportional Bernoulli sampling with a CONTINUOUS per-row
    * weight (here length-proportional, capped at 4000 chars → weight 1):
    * keep a doc iff its md5 bucket-of-10000 falls under weight*10000 —
    * the per-row generalization of [[dataMixture]]'s per-group rates.
    * Deterministic (hash, not rand), scan-side (no shuffle before the
    * rollup), integer arithmetic end to end. The training-data use:
    * sample proportional to quality/informativeness without a sort,
    * shuffle, or any coordination across executors.
    */
  def weightedSample: Q = (s, d) => {
    val b = hashBucket(col("doc_id"), 10000)
    val thresh = expr("(least(n_chars, 4000) * 10000) div 4000")
    Tables.documents(s, d)
      .filter(b < thresh)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  val weightedSampleSql: String =
    s"""SELECT lang, count(*) AS n_sampled,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE ${hashBucketSql("doc_id", 10000)} < (least(n_chars, 4000) * 10000) // 4000
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Class-rebalancing upsample: every language is replicated toward the
    * majority class with an integer factor `n_max div n_c` — the
    * deterministic oversampling a skewed fine-tuning set gets before
    * training. Replication is `explode(sequence(1, factor))`: scan-side
    * fan-out, no shuffle until the accounting rollup, and the factor
    * table is a 5-row broadcast. (Bernoulli-style fractional balance
    * composes via [[weightedSample]]; exact integer factors keep the gate
    * hash-exact.)
    */
  def classUpsample: Q = (s, d) => {
    val counts = Tables.documents(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_before"))
    val factors = counts.crossJoin(
        broadcast(counts.agg(max(col("n_before")).as("n_max"))))
      .withColumn("factor", expr("n_max div n_before"))
      .select(col("lang"), col("n_before"), col("factor"))
    Tables.documents(s, d)
      .join(broadcast(factors), "lang")
      .select(col("lang"), col("n_before"), col("factor"), col("n_chars"),
        explode(sequence(lit(1), col("factor"))).as("rep"))
      .groupBy(col("lang"))
      .agg(max(col("n_before")).as("n_before"),
        max(col("factor")).as("factor"),
        count(lit(1)).as("n_after"),
        sum(col("n_chars")).as("sum_chars_after"))
      .orderBy(col("lang"))
  }

  val classUpsampleSql: String =
    """WITH counts AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
      |f AS (SELECT lang, n_before,
      |    (SELECT max(n_before) FROM counts) // n_before AS factor
      |  FROM counts),
      |rep AS (SELECT d.lang, f.n_before, f.factor, d.n_chars
      |  FROM documents d JOIN f USING (lang)
      |  CROSS JOIN unnest(generate_series(1, (SELECT max(factor) FROM f))) AS t(i)
      |  WHERE t.i <= f.factor)
      |SELECT lang, CAST(max(n_before) AS BIGINT) AS n_before,
      |  CAST(max(factor) AS BIGINT) AS factor,
      |  count(*) AS n_after,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars_after
      |FROM rep GROUP BY lang ORDER BY lang""".stripMargin

  /** Leave-one-out target encoding of `source` against document length:
    * each document's feature is the mean n_chars of the OTHER docs in its
    * category — `(Σ - x) / (n - 1)` from exact integer moments, so the
    * encoding is bit-stable at any partitioning and cannot leak the row's
    * own target. Category stats are a tiny broadcast back onto the scan;
    * the gate rolls the per-doc encodings up per category.
    */
  def targetEncode: Q = (s, d) => {
    val stats = Tables.documents(s, d).groupBy(col("source"))
      .agg(sum(col("n_chars")).as("sx"), count(lit(1)).as("n"))
    Tables.documents(s, d)
      .join(broadcast(stats), "source")
      .filter(col("n") > 1)
      .withColumn("enc",
        (col("sx") - col("n_chars")).cast("double") / (col("n") - 1))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        Num.roundAt(4)(min(col("enc"))).as("enc_min"),
        Num.roundAt(4)(max(col("enc"))).as("enc_max"))
      .orderBy(col("source"))
  }

  val targetEncodeSql: String =
    s"""WITH st AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS sx,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY source),
      |enc AS (SELECT d.source,
      |    CAST(st.sx - d.n_chars AS DOUBLE) / (st.n - 1) AS enc
      |  FROM documents d JOIN st USING (source) WHERE st.n > 1)
      |SELECT source, count(*) AS n_docs,
      |  ${Num.roundAtSql(4, "min(enc)")} AS enc_min,
      |  ${Num.roundAtSql(4, "max(enc)")} AS enc_max
      |FROM enc GROUP BY source ORDER BY source""".stripMargin

  /** Sliding-window document chunking (window 16 tokens, stride 12 — the
    * overlap-chunk prep for context-window training / RAG indexing):
    * each document explodes into deterministic chunk rows with an md5
    * content gate per chunk. Generator fan-out is scan-side (sequence +
    * posexplode, no shuffle before the presentation sort); fan-out per doc
    * is ceil(tokens/stride), bounded by document length — at 100 TB this
    * is a map-only stage whose output feeds packing/tokenization.
    */
  def docChunks: Q = (s, d) => {
    val W = 16; val T = 12
    Tables.documents(s, d)
      .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(1), col("n"), lit(T))).as(Seq("chunk_idx", "start")))
      .withColumn("chunk_len", least(lit(W), col("n") - col("start") + 1).cast("int"))
      .withColumn("chunk_md5", md5(concat_ws(" ",
        expr(s"slice(toks, start, $W)"))))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("start").cast("int").as("start"), col("chunk_len"), col("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val docChunksSql: String =
    s"""WITH tok AS (SELECT doc_id, ${TA.tokensSql("text")} AS toks FROM documents),
      |base AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
      |ch AS (SELECT doc_id, n, toks,
      |    unnest(generate_series(1, n, 12)) AS start FROM base)
      |SELECT doc_id,
      |  CAST((start - 1) // 12 AS INTEGER) AS chunk_idx,
      |  CAST(start AS INTEGER) AS start,
      |  CAST(least(16, n - start + 1) AS INTEGER) AS chunk_len,
      |  md5(array_to_string(toks[start:start+15], ' ')) AS chunk_md5
      |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------- rank-quantile normalization

  /** Rank-based quantile normalization of a numeric feature WITHIN each
    * group — the distribution-free feature map (percent-rank to uniform
    * [0,1], plus the decile bucket) that robust-scales skewed features
    * before training, per segment so segments with different base rates
    * normalize independently.
    *
    * SCALE: one shuffle on the group key, one in-partition sort — the
    * window-function shape shared by the whole Temporal family; both
    * window functions share a single Window node. The ORDER BY carries
    * the entity key as a tie-break so ranks (and therefore ntile edges)
    * are total-order deterministic — percent_rank alone is tie-stable,
    * but ntile without a unique order key assigns tied rows to buckets
    * by partition arrival order, which no hash gate would survive.
    */
  def rankNormalize: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("pct_rank", Num.roundAt(6)(percent_rank().over(w)))
      .withColumn("decile", ntile(10).over(w))
      .orderBy(col("c_custkey"))
  }

  val rankNormalizeSql: String =
    s"""SELECT c_custkey, c_mktsegment, c_acctbal,
      |  ${Num.roundAtSql(6, "percent_rank() OVER w")} AS pct_rank,
      |  ntile(10) OVER w AS decile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Deterministic per-group RESERVOIR sample: the k docs per language
    * with the smallest md5-hash priorities — the hash plays the role of
    * the reservoir's random draw, so the sample is uniform-ish, stable
    * across reruns/partitionings, and oracle-checkable. Executed with the
    * `graft_topk` heap aggregate (value = negated 52-bit hash): each
    * mapper ships at most k pairs per group, NO per-group sort window —
    * the one-pass bounded-memory shape a reservoir means at 100 TB.
    * (52-bit hash slice: exact in the aggregate's double priority.)
    */
  def reservoirSample: Q = (s, d) => {
    val hv = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    Tables.documents(s, d)
      .withColumn("_neg", -hv.cast("double"))
      .groupBy(col("lang"))
      .agg(call_function("graft_topk", col("_neg"), col("doc_id"), lit(20)).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col("lang"), (col("rnk0") + 1).cast("int").as("rnk"),
        col("t.payload").as("doc_id"))
      .orderBy(col("lang"), col("rnk"))
  }

  val reservoirSampleSql: String =
    """SELECT lang, CAST(rnk AS INTEGER) AS rnk, doc_id
      |FROM (SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rnk
      |  FROM (SELECT lang, doc_id,
      |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) AS hv
      |    FROM documents))
      |WHERE rnk <= 20 ORDER BY lang, rnk""".stripMargin

  /** CONTEXT-LENGTH truncation analysis: what share of tokens survives a
    * context cap of 512, per language — the table that picks a training
    * sequence length. All integers (token counts, least() caps, micro
    * `div` share): scan-side token counting, one rollup shuffle.
    */
  def contextTruncation: Q = (s, d) => {
    val n = size(TA.tokens(col("text")))
    Tables.documents(s, d)
      .withColumn("n_tokens", n.cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(least(col("n_tokens"), lit(512L))).as("kept_tokens"),
        sum(when(col("n_tokens") > 512, 1L).otherwise(0L)).as("n_truncated"))
      .withColumn("kept_share_micro",
        expr("(kept_tokens * 1000000) div total_tokens"))
      .orderBy(col("lang"))
  }

  val contextTruncationSql: String =
    s"""WITH t AS (SELECT lang,
      |    CAST(len(${TA.tokensSql("text")}) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(sum(least(n_tokens, 512)) AS BIGINT) AS kept_tokens,
      |  CAST(sum(CASE WHEN n_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
      |  (CAST(sum(least(n_tokens, 512)) AS BIGINT) * 1000000)
      |    // CAST(sum(n_tokens) AS BIGINT) AS kept_share_micro
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** Deterministic hash-ring NEGATIVE SAMPLING for contrastive training:
    * each anchor takes its next candidates in md5-hash order (within a
    * 16-way hash bucket) whose label differs — up to 3 negatives per
    * anchor. The hash ordering is a reproducible stand-in for a random
    * shuffle ("in-batch negatives"): unrelated to label or insertion
    * order, stable across reruns, cluster sizes, and repartitioning — the
    * property `rand()`-based samplers lose the moment a partition moves.
    *
    * SCALE: one per-bucket sort (distributed — buckets shard the ring, no
    * global window) + an EQUI-join on (bucket, rank): each anchor probes
    * exactly 6 successor ranks via explode, so candidate volume is 6·N
    * flat. Anchors at the tail of a bucket may get < 3 negatives — the
    * deterministic analogue of an incomplete batch, accepted rather than
    * wrapping the ring (a wrap join would need a second pass).
    */
  def negativeSampling: Q = (s, d) => {
    val rows = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        md5(col("vec_id").cast("string")).as("h"))
      .withColumn("bucket", substring(col("h"), 1, 1))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("h").asc, col("vec_id").asc)
    val ranked = rows.withColumn("rn", row_number().over(w))
    val probes = ranked
      .withColumn("off", explode(array((1 to 6).map(lit(_)): _*)))
      .select(col("bucket"), (col("rn") + col("off")).as("rn_b"),
        col("vec_id").as("anchor_id"), col("label").as("anchor_label"))
    val cands = ranked.select(col("bucket"), col("rn").as("rn_b"),
      col("vec_id").as("neg_id"), col("label").as("neg_label"))
    val perAnchor = Window.partitionBy(col("anchor_id")).orderBy(col("rn_b").asc)
    probes.join(cands, Seq("bucket", "rn_b"))
      .filter(col("neg_label") =!= col("anchor_label"))
      .withColumn("neg_rank", row_number().over(perAnchor))
      .filter(col("neg_rank") <= 3)
      .select(col("anchor_id"), col("neg_rank").cast("int").as("neg_rank"),
        col("neg_id"), col("neg_label"))
      .orderBy(col("anchor_id"), col("neg_rank"))
  }

  val negativeSamplingSql: String =
    """WITH r AS (
      |  SELECT vec_id, label, md5(CAST(vec_id AS VARCHAR)) AS h FROM embeddings),
      |ranked AS (
      |  SELECT substr(h, 1, 1) AS bucket, vec_id, label, h,
      |    row_number() OVER (PARTITION BY substr(h, 1, 1) ORDER BY h, vec_id) AS rn
      |  FROM r),
      |probes AS (
      |  SELECT bucket, rn + off AS rn_b, vec_id AS anchor_id,
      |    label AS anchor_label
      |  FROM ranked CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6]) AS off)),
      |cand AS (
      |  SELECT bucket, rn AS rn_b, vec_id AS neg_id, label AS neg_label
      |  FROM ranked),
      |j AS (
      |  SELECT anchor_id, neg_id, neg_label,
      |    row_number() OVER (PARTITION BY anchor_id ORDER BY rn_b) AS neg_rank
      |  FROM probes JOIN cand USING (bucket, rn_b)
      |  WHERE neg_label <> anchor_label)
      |SELECT anchor_id, CAST(neg_rank AS INTEGER) AS neg_rank, neg_id, neg_label
      |FROM j WHERE neg_rank <= 3 ORDER BY anchor_id, neg_rank""".stripMargin

  /** CHI-SQUARED FEATURE SELECTION (presence/absence contingency of each
    * token against the binary class lang='en'), fully integer-exact: the
    * χ² statistic N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is evaluated in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) wide-integer arithmetic and
    * surfaced as `chi2_micro = ⌊χ²·10⁶⌋` — no doubles anywhere, so the
    * ranking is bit-stable across engines, partitionings, and cluster
    * sizes (the [[Num]] discipline applied to a statistic that is usually
    * computed in floating point). Top-30 by (χ², token).
    *
    * SCALE: explode(distinct tokens) → one (token) hash aggregate with
    * map-side combine; class totals are a 1-row broadcast; the top-k is
    * TakeOrderedAndProject. Linear in corpus tokens, no joins on the
    * data-sized side. Intermediates are sized: at N = 5·10⁵ docs the
    * numerator peaks ~3·10³⁴ < 10³⁸ (DECIMAL38) < 1.7·10³⁸ (int128).
    */
  def chi2Features: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
    val present = docs.select(col("lang"),
      explode(array_distinct(TA.tokens(col("text")))).as("token"))
    val totals = docs.agg(count(lit(1)).as("n_total"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
    present.groupBy(col("token"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("a"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("b"))
      .filter(col("a") + col("b") >= 10)
      .crossJoin(broadcast(totals))
      .filter(col("a") + col("b") < col("n_total"))
      .withColumn("c", col("n_en") - col("a"))
      .withColumn("dd", col("n_total") - col("n_en") - col("b"))
      .withColumn("diff", dec(col("a")) * dec(col("dd")) - dec(col("b")) * dec(col("c")))
      .withColumn("num", dec(col("n_total")) * col("diff") * col("diff") * lit(1000000))
      .withColumn("den", dec(col("a") + col("b")) * dec(col("c") + col("dd")) *
        dec(col("n_en")) * dec(col("n_total") - col("n_en")))
      .withColumn("chi2_micro", expr("CAST(num div den AS BIGINT)"))
      .select(col("token"), col("a"), col("b"), col("chi2_micro"))
      .orderBy(col("chi2_micro").desc, col("token").asc)
      .limit(30)
  }

  val chi2FeaturesSql: String =
    s"""WITH present AS (
      |  SELECT lang, unnest(list_distinct(${TA.tokensSql("text")})) AS token
      |  FROM documents),
      |totals AS (
      |  SELECT count(*) AS n_total,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en
      |  FROM documents),
      |counts AS (
      |  SELECT token,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
      |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS b
      |  FROM present GROUP BY token HAVING count(*) >= 10),
      |x AS (
      |  SELECT token, a, b, n_en - a AS c, n_total - n_en - b AS dd,
      |    n_total, n_en
      |  FROM counts CROSS JOIN totals WHERE a + b < n_total),
      |scored AS (
      |  SELECT token, a, b,
      |    CAST((CAST(n_total AS HUGEINT)
      |        * (CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c)
      |        * (CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c)
      |        * 1000000)
      |      // (CAST(a + b AS HUGEINT) * (c + dd) * n_en * (n_total - n_en))
      |      AS BIGINT) AS chi2_micro
      |  FROM x)
      |SELECT token, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, chi2_micro
      |FROM scored ORDER BY chi2_micro DESC, token LIMIT 30""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_chi2_features" -> chi2Features,
    "q_negative_sampling" -> negativeSampling,
    "q_reservoir_sample" -> reservoirSample,
    "q_context_truncation" -> contextTruncation,
    "q_rank_normalize" -> rankNormalize,
    "q_doc_chunks" -> docChunks,
    "q_mixture_temperature" -> mixtureTemperature,
    "q_class_upsample" -> classUpsample,
    "q_target_encode" -> targetEncode,
    "q_data_mixture" -> dataMixture,
    "q_weighted_sample" -> weightedSample,
    "q_hash_split" -> hashSplit,
    "q_quality_filter" -> qualityFilter,
    "q_token_packing" -> tokenPacking,
    "q_outlier_zscore" -> outlierZscore,
  )

  val oracles: Map[String, String] = Map(
    "q_chi2_features" -> chi2FeaturesSql,
    "q_negative_sampling" -> negativeSamplingSql,
    "q_reservoir_sample" -> reservoirSampleSql,
    "q_context_truncation" -> contextTruncationSql,
    "q_rank_normalize" -> rankNormalizeSql,
    "q_doc_chunks" -> docChunksSql,
    "q_mixture_temperature" -> mixtureTemperatureSql,
    "q_class_upsample" -> classUpsampleSql,
    "q_target_encode" -> targetEncodeSql,
    "q_data_mixture" -> dataMixtureSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_hash_split" -> hashSplitSql,
    "q_quality_filter" -> qualityFilterSql,
    "q_token_packing" -> tokenPackingSql,
    "q_outlier_zscore" -> outlierZscoreSql,
  )
}
