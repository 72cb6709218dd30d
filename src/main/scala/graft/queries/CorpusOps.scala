package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{TextAnalysis => TA}

/** Corpus-governance operators — the policy layer a 100 TB pre-training
  * pipeline runs AFTER per-document scoring ([[TrainPrepOps]]) and dedup
  * ([[DedupOps]]): per-domain quotas, stratified downsampling, repetition
  * screens, and benchmark decontamination. The reference has no corpus ops
  * (it is a FAERS star schema); these extend the beyond-parity north star
  * (SURVEY.md §7.5).
  *
  * Scale shapes:
  *  - quota/stratification are ONE window shuffle on the policy key
  *    (source / lang) + a partial-aggregated rollup; the per-key sort is
  *    bounded by the largest single domain, not the corpus.
  *  - the repetition screen is the explode→two-level-aggregate form: linear
  *    in total tokens with map-side combine on (doc, token); the HOF
  *    alternative (count each distinct token via a lambda scan) is O(len²)
  *    per document and dies on long docs.
  *  - decontamination is a shingle semi-join: benchmark shingles are tiny
  *    (they fit a broadcast at any realistic benchmark size), so the train
  *    side is never shuffled — flagging rides the scan.
  *
  * Determinism discipline throughout (see [[Num]]): thresholds compare
  * integer cross-products (`mx*1000 > n*120`, never `mx/n > 0.12`), sample
  * membership is md5-ordered, and the only doubles are final presentation
  * ratios derived from exact integer counts.
  */
object CorpusOps {

  type Q = (SparkSession, String) => DataFrame

  /** Per-domain quota. */
  private val DomainCap = 20
  /** Per-language stratified sample size. */
  private val StratumK = 50
  /** Every ~97th doc_id plays the held-out benchmark set. */
  private val BenchMod = 97

  /** Per-domain quota: keep the first [[DomainCap]] docs per source (by
    * doc_id — stable under re-partitioning), account for the rest. The
    * C4-style guard against one crawl domain flooding the mixture.
    * One window + one aggregate; no join, no second pass.
    */
  def domainCap: Q = (s, d) => {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("rn") <= DomainCap, 1).otherwise(0)).as("n_kept"),
        sum(when(col("rn") <= DomainCap, col("n_chars"))).as("kept_chars"),
        max(when(col("rn") <= DomainCap, col("doc_id"))).as("last_kept_doc"))
      .orderBy(col("source"))
  }

  val domainCapSql: String =
    s"""WITH r AS (SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT source, count(*) AS n_total,
      |  CAST(sum(CASE WHEN rn <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN rn <= $DomainCap THEN n_chars END) AS BIGINT) AS kept_chars,
      |  max(CASE WHEN rn <= $DomainCap THEN doc_id END) AS last_kept_doc
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  /** Stratified downsample: exactly min([[StratumK]], |stratum|) docs per
    * language, membership decided by md5(doc_id) order — a deterministic
    * "random" sample that is reproducible across reruns and cluster sizes
    * (rand() is neither). Unlike [[TrainPrepOps.dataMixture]]'s Bernoulli
    * rates, this form guarantees the exact stratum count a balanced eval
    * set needs.
    */
  def stratifiedSample: Q = (s, d) => {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= StratumK)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))
  }

  val stratifiedSampleSql: String =
    s"""WITH r AS (SELECT lang, source, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT lang, count(*) AS n_sampled,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |FROM r WHERE rn <= $StratumK GROUP BY lang ORDER BY lang""".stripMargin

  /** Gopher-style repetition screen: drop documents dominated by one token
    * (mx/n > 0.12) or with collapsed vocabulary (distinct/n < 0.35), with
    * first-failing-reason accounting per language. Thresholds compare
    * integer cross-products, so the verdict is exact — no float epsilon at
    * the boundary.
    */
  def repetitionFilter: Q = (s, d) => {
    val perTok = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(TA.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val perDoc = perTok.groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n"), max(col("c")).as("mx"),
        count(lit(1)).as("nd"))
    // zero-token docs produce no explode rows and would silently escape
    // every verdict bucket (breaking "verdicts partition the corpus");
    // re-anchor on the full document set and give them their own verdict
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id", "lang"), "left")
      .withColumn("verdict",
        when(col("n").isNull, "drop:empty")
          .when(col("mx") * 1000 > col("n") * 120, "drop:top_token")
          .when(col("nd") * 1000 < col("n") * 350, "drop:low_diversity")
          .otherwise("keep"))
      .groupBy(col("lang"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n"), lit(0L))).as("sum_tokens"))
      .orderBy(col("lang"), col("verdict"))
  }

  val repetitionFilterSql: String = {
    val toks = TA.tokensSql("text")
    s"""WITH ex AS (SELECT doc_id, lang, unnest($toks) AS tok FROM documents),
      |pt AS (SELECT doc_id, lang, tok, count(*) AS c FROM ex GROUP BY 1, 2, 3),
      |pd AS (SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(max(c) AS BIGINT) AS mx, CAST(count(*) AS BIGINT) AS nd
      |  FROM pt GROUP BY 1, 2),
      |v AS (SELECT d.lang,
      |    coalesce(pd.n, 0) AS n,
      |    CASE WHEN pd.n IS NULL THEN 'drop:empty'
      |         WHEN mx * 1000 > pd.n * 120 THEN 'drop:top_token'
      |         WHEN nd * 1000 < pd.n * 350 THEN 'drop:low_diversity'
      |         ELSE 'keep' END AS verdict
      |  FROM documents d LEFT JOIN pd
      |    ON d.doc_id = pd.doc_id AND d.lang = pd.lang)
      |SELECT lang, verdict, count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS sum_tokens
      |FROM v GROUP BY lang, verdict ORDER BY lang, verdict""".stripMargin
  }

  /** Benchmark decontamination: flag training documents sharing any word
    * trigram with the held-out set (doc_id % [[BenchMod]] == 0 plays the
    * benchmark). The real-pipeline shape: benchmark shingles are a few
    * thousand rows at most — broadcast them and the training corpus is
    * flagged scan-side via a semi-join probe, no shuffle of the 100 TB
    * side. Per-language contamination rates come out as exact counts plus
    * one presentation ratio.
    */
  def decontaminate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // the fused native kernel (one JVM call per document, bit-equal to the
    // HOF tokenize→transform→slice chain per TextHashSpec) — the
    // interpreted HOF form was 2.5x this query's runtime
    def shingleRows(df: DataFrame) = df.select(col("doc_id"), col("lang"),
      explode(array_distinct(
        call_function("graft_shingles", col("text"), lit(3)))).as("sh"))
    // benchmark shingles: derived from the 1% held-out slice only — the
    // filter runs BEFORE tokenize/explode, so the expensive path touches
    // 1/BenchMod of the corpus and the result is a tiny broadcast set
    val bench = shingleRows(docs.filter(col("doc_id") % BenchMod === 0))
      .select(col("sh")).distinct()
    // the train side is flagged scan-side: explode → broadcast-semi probe
    // → per-doc dedup → per-lang count. The 100 TB corpus is never
    // shuffled whole; only matched (doc, lang) pairs reach the exchange.
    val contPerLang = shingleRows(docs.filter(col("doc_id") % BenchMod =!= 0))
      .join(broadcast(bench), Seq("sh"), "left_semi")
      .select(col("doc_id"), col("lang")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("hits"))
    val totals = docs.filter(col("doc_id") % BenchMod =!= 0)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_train"))
    totals.join(broadcast(contPerLang), Seq("lang"), "left")
      .select(col("lang"), col("n_train"),
        coalesce(col("hits"), lit(0L)).as("n_contaminated"))
      .withColumn("pct_contaminated",
        Num.roundAt(2)(col("n_contaminated") * lit(100.0) / col("n_train")))
      .orderBy(col("lang"))
  }

  val decontaminateSql: String = {
    val toks = TA.tokensSql("text")
    val sh = TA.shinglesSql("toks", 3)
    s"""WITH tok AS (SELECT doc_id, lang, $toks AS toks FROM documents),
      |sh AS (SELECT doc_id, lang, unnest(list_distinct($sh)) AS sh FROM tok),
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % $BenchMod = 0),
      |cont AS (SELECT DISTINCT doc_id FROM sh
      |  WHERE doc_id % $BenchMod <> 0 AND sh IN (SELECT sh FROM bench))
      |SELECT lang, count(*) AS n_train,
      |  CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
      |  ${Num.roundAtSql(2, "sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont) THEN 1 ELSE 0 END) * 100.0 / count(*)")} AS pct_contaminated
      |FROM documents WHERE doc_id % $BenchMod <> 0
      |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Feature hashing (the "hashing trick"): tokens map to a fixed
    * 32-bucket feature space via md5 — vocabulary-free featurization, the
    * step that turns a text corpus into fixed-width training vectors
    * without a dictionary build or broadcast. Output: each document's
    * sparse vector rendered canonically (`bucket:tf` pairs, sorted), plus
    * its nnz — string-rendered so the whole vector is hash-gated.
    * Restricted to doc_id < 50 to keep the gated output row-bounded; the
    * featurization itself is corpus-wide linear, explode → two-level
    * partial aggregate, same scale shape as the repetition screen.
    */
  def featureHashing: Q = (s, d) => {
    val bucket = conv(substring(md5(col("tok")), 1, 15), 16, 10)
      .cast("long") % 32
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
      .withColumn("b", bucket)
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("pair", concat(lpad(col("b"), 2, "0"), lit(":"), col("tf")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nnz"),
        array_join(array_sort(collect_list(col("pair"))), " ").as("sparse_vec"))
      .orderBy(col("doc_id"))
  }

  val featureHashingSql: String = {
    val toks = TA.tokensSql("text")
    s"""WITH ex AS (SELECT doc_id, unnest($toks) AS tok
      |    FROM documents WHERE doc_id < 50),
      |tf AS (SELECT doc_id,
      |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 32 AS b,
      |    count(*) AS tf
      |  FROM ex GROUP BY 1, 2)
      |SELECT doc_id, count(*) AS nnz,
      |  array_to_string(list_sort(list(lpad(CAST(b AS VARCHAR), 2, '0')
      |    || ':' || CAST(tf AS VARCHAR))), ' ') AS sparse_vec
      |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** CORPUS DRIFT monitor: the language-mix difference between a snapshot
    * (every even doc_id — "yesterday's corpus") and the full corpus, as
    * per-language share deltas plus the total-variation contribution, all
    * in integer micro units (no logs — KL needs libm `ln`, whose last-bit
    * behavior differs across engines; TV distance is pure integer
    * arithmetic and detects the same mix shifts). ONE scan: both
    * snapshots count in the same conditional aggregate; totals ride in as
    * a broadcast scalar row.
    */
  def distributionDrift: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        count(lit(1)).as("n_b"))
    val totals = counts.agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_a"), col("n_b"),
        expr("(n_a * 1000000) div tot_a").as("share_a_micro"),
        expr("(n_b * 1000000) div tot_b").as("share_b_micro"),
        abs(expr("(n_a * 1000000) div tot_a") -
          expr("(n_b * 1000000) div tot_b")).as("abs_diff_micro"))
      .orderBy(col("lang"))
  }

  val distributionDriftSql: String =
    """WITH c AS (SELECT lang,
      |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    count(*) AS n_b
      |  FROM documents GROUP BY lang),
      |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
      |    CAST(sum(n_b) AS BIGINT) AS tot_b FROM c)
      |SELECT lang, n_a, n_b,
      |  (n_a * 1000000) // tot_a AS share_a_micro,
      |  (n_b * 1000000) // tot_b AS share_b_micro,
      |  abs((n_a * 1000000) // tot_a - (n_b * 1000000) // tot_b) AS abs_diff_micro
      |FROM c CROSS JOIN t ORDER BY lang""".stripMargin

  /** URL CANONICALIZATION for web-corpus dedup: crawls re-fetch the same
    * page under case-varied hosts, default ports, tracking params
    * (`utm_*`), fragments, and trailing slashes; grouping by a normalized
    * URL collapses them BEFORE any content fetch or text dedup runs — the
    * cheapest dedup pass in a crawl pipeline because it touches only the
    * URL column. The fixture synthesizes all five variant classes
    * deterministically from the documents table; normalization =
    * strip fragment → lowercase scheme+authority → drop `:443` → drop
    * `utm_*` params → tidy separators → drop trailing slash. All regexes
    * are in the RE2 ∩ Java-regex common subset, applied identically by
    * both engines.
    *
    * SCALE: pure per-row projection (codegen'd regexp chain on the scan)
    * + one hash aggregate on the canonical key — no join, no window; the
    * shuffle carries only (norm_url, count, min_id).
    */
  def urlNormalize: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val url = concat(
      when(col("doc_id") % 3 === 0, "HTTPS://").otherwise("https://"),
      when(col("doc_id") % 2 === 0, upper(col("source"))).otherwise(col("source")),
      lit(".Example.COM"),
      when(col("doc_id") % 5 === 0, ":443").otherwise(""),
      concat(lit("/"), col("lang"), lit("/page/"), (col("doc_id") % 50).cast("string")),
      when(col("doc_id") % 4 === 0, "/").otherwise(""),
      concat(lit("?utm_source=feed&item="), (col("doc_id") % 25).cast("string"),
        lit("&utm_campaign=x")),
      when(col("doc_id") % 6 === 0, "#section2").otherwise(""))
    val noFrag = regexp_replace(url, "#.*", "")
    val canon = doc.select(col("doc_id"), noFrag.as("no_frag"))
      .withColumn("pfx", regexp_extract(col("no_frag"), "^[^/]*//[^/?#]*", 0))
      .withColumn("head", regexp_replace(lower(col("pfx")), ":443$", ""))
      .withColumn("tail_raw", expr("substring(no_frag, length(pfx) + 1)"))
      .withColumn("tail_noutm",
        regexp_replace(col("tail_raw"), "utm_[a-z]+=[^&]*&?", ""))
      .withColumn("tail_tidy",
        regexp_replace(regexp_replace(col("tail_noutm"), "\\?&", "?"), "[?&]+$", ""))
      .withColumn("norm_url",
        concat(col("head"), regexp_replace(col("tail_tidy"), "/+$", "")))
    canon.groupBy(col("norm_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("canonical_id"))
      .orderBy(col("norm_url"))
  }

  val urlNormalizeSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
      |    || '.Example.COM'
      |    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
      |    || '/' || lang || '/page/' || CAST(doc_id % 50 AS VARCHAR)
      |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      |    || '?utm_source=feed&item=' || CAST(doc_id % 25 AS VARCHAR)
      |    || '&utm_campaign=x'
      |    || (CASE WHEN doc_id % 6 = 0 THEN '#section2' ELSE '' END) AS url
      |  FROM documents),
      |steps AS (
      |  SELECT doc_id, regexp_replace(url, '#.*', '') AS no_frag FROM u),
      |split AS (
      |  SELECT doc_id, no_frag,
      |    regexp_extract(no_frag, '^[^/]*//[^/?#]*', 0) AS pfx
      |  FROM steps),
      |parts AS (
      |  SELECT doc_id,
      |    regexp_replace(lower(pfx), ':443$', '') AS head,
      |    substr(no_frag, length(pfx) + 1) AS tail_raw
      |  FROM split),
      |cleaned AS (
      |  SELECT doc_id, head,
      |    regexp_replace(regexp_replace(
      |      regexp_replace(tail_raw, 'utm_[a-z]+=[^&]*&?', '', 'g'),
      |      '\?&', '?'), '[?&]+$', '') AS tail_tidy
      |  FROM parts),
      |norm AS (
      |  SELECT doc_id, head || regexp_replace(tail_tidy, '/+$', '') AS norm_url
      |  FROM cleaned)
      |SELECT norm_url, count(*) AS n_variants, min(doc_id) AS canonical_id
      |FROM norm GROUP BY norm_url ORDER BY norm_url""".stripMargin

  /** Gopher-style document hard rules (Rae et al. 2021, public): word
    * count in [50, 100k], mean word length in [3, 10] characters, and at
    * least 2 stopword hits — the published pre-training doc screen, with
    * first-failing-reason accounting per source. Complements
    * [[repetitionFilter]] (that one is Gopher's REPETITION section; this
    * is the length/lexical section) and [[TrainPrepOps.qualityFilter]]
    * (ratio-threshold soft score) — three screens a real pipeline stacks.
    *
    * Entirely scan-side: tokens, lengths, and stopword hits are per-row
    * HOF projections inside codegen; the only shuffle is the final
    * (source, verdict) rollup with map-side combine. Mean-word-length
    * thresholds compare integer cross-products (`sum_len < 3·n`), so the
    * verdict is exact at the boundary in both engines.
    */
  def gopherRules: Q = (s, d) => {
    val toks = TA.tokens(col("text"))
    val sw = array(TA.stopwords.map(lit): _*)
    Tables.documents(s, d)
      .select(col("source"), size(toks).as("n"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
          .as("sum_len"),
        size(filter(toks, t => array_contains(sw, t))).as("n_sw"))
      .withColumn("verdict",
        when(col("n") < 50, "drop:too_few_words")
          .when(col("n") > 100000, "drop:too_many_words")
          .when(col("sum_len") < col("n") * 3, "drop:short_words")
          .when(col("sum_len") > col("n") * 10, "drop:long_words")
          .when(col("n_sw") < 2, "drop:no_stopwords")
          .otherwise("keep"))
      .groupBy(col("source"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).cast("long").as("sum_words"))
      .orderBy(col("source"), col("verdict"))
  }

  val gopherRulesSql: String = {
    val toks = TA.tokensSql("text")
    val swList = TA.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH s AS (SELECT source, $toks AS toks FROM documents),
      |m AS (SELECT source, len(toks) AS n,
      |    coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS sum_len,
      |    len(list_filter(toks, t -> list_contains($swList, t))) AS n_sw
      |  FROM s),
      |v AS (SELECT source, n,
      |    CASE WHEN n < 50 THEN 'drop:too_few_words'
      |         WHEN n > 100000 THEN 'drop:too_many_words'
      |         WHEN sum_len < 3*n THEN 'drop:short_words'
      |         WHEN sum_len > 10*n THEN 'drop:long_words'
      |         WHEN n_sw < 2 THEN 'drop:no_stopwords'
      |         ELSE 'keep' END AS verdict
      |  FROM m)
      |SELECT source, verdict, count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS sum_words
      |FROM v GROUP BY source, verdict ORDER BY source, verdict""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_gopher_rules" -> gopherRules,
    "q_url_normalize" -> urlNormalize,
    "q_distribution_drift" -> distributionDrift,
    "q_feature_hashing" -> featureHashing,
    "q_domain_cap" -> domainCap,
    "q_stratified_sample" -> stratifiedSample,
    "q_repetition_filter" -> repetitionFilter,
    "q_decontaminate" -> decontaminate,
  )

  val oracles: Map[String, String] = Map(
    "q_gopher_rules" -> gopherRulesSql,
    "q_url_normalize" -> urlNormalizeSql,
    "q_distribution_drift" -> distributionDriftSql,
    "q_feature_hashing" -> featureHashingSql,
    "q_domain_cap" -> domainCapSql,
    "q_stratified_sample" -> stratifiedSampleSql,
    "q_repetition_filter" -> repetitionFilterSql,
    "q_decontaminate" -> decontaminateSql,
  )
}
