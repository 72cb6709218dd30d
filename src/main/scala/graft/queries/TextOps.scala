package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Hashing, TextAnalysis => TA}

/** Text-analysis operator queries over the `documents` table (beyond-parity
  * training-data ops; see ops.TextAnalysis). Each is per-document and
  * shuffle-free except for the final presentation sort.
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", TA.tokens(col("text")))

  private val toksSql = TA.tokensSql("text")

  // see Num.roundAt: q_text_stats diverged on 2/5000 docs at sf0.1 with
  // builtin round; these queries' scores are exact rationals
  private def r4(c: Column): Column = Num.roundAt(4)(c)
  private def r4Sql(e: String): String = Num.roundAtSql(4, e)

  /** Quality scoring: length/stopword/vocabulary/punctuation signals. */
  def textStats: Q = (s, d) => {
    withToks(Tables.documents(s, d))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        length(col("text")).as("n_chars_calc"),
        r4(TA.avgTokenLen(col("toks"))).as("avg_token_len"),
        r4(TA.typeTokenRatio(col("toks"))).as("type_token_ratio"),
        r4(TA.stopwordRatio(col("toks"))).as("stopword_ratio"),
        r4(TA.punctRatio(col("text"))).as("punct_ratio"),
        r4(TA.qualityScore(col("text"), col("toks"))).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  private val swList = TA.stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  val textStatsSql: String = {
    val lenScore = "least(CAST(greatest(len(toks), 1) AS DOUBLE) / 100.0, 1.0)"
    val swScore = s"least((len(list_filter(toks, t -> list_contains($swList, t))) / CAST(greatest(len(toks), 1) AS DOUBLE)) * 5.0, 1.0)"
    val ttr = "len(list_distinct(toks)) / CAST(greatest(len(toks), 1) AS DOUBLE)"
    val punct = """len(regexp_extract_all(text, '[^\w\s]')) / CAST(greatest(length(text), 1) AS DOUBLE)"""
    s"""WITH tok AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS INTEGER) AS n_tokens,
      |  CAST(length(text) AS INTEGER) AS n_chars_calc,
      |  ${r4Sql("list_sum(list_transform(toks, t -> length(t))) / CAST(greatest(len(toks), 1) AS DOUBLE)")} AS avg_token_len,
      |  ${r4Sql(ttr)} AS type_token_ratio,
      |  ${r4Sql(s"len(list_filter(toks, t -> list_contains($swList, t))) / CAST(greatest(len(toks), 1) AS DOUBLE)")} AS stopword_ratio,
      |  ${r4Sql(punct)} AS punct_ratio,
      |  ${r4Sql(s"($lenScore * 0.3 + $swScore * 0.2 + $ttr * 0.3) * greatest(1.0 - $punct * 10.0, 0.0) + greatest(1.0 - $punct * 10.0, 0.0) * 0.2")} AS quality_score
      |FROM tok ORDER BY doc_id""".stripMargin
  }

  /** Language-ID heuristic: marker-word hit-rate argmax per language,
    * compared against the labeled `lang` column, rolled up per (lang, pred).
    */
  def langId: Q = (s, d) => {
    withToks(Tables.documents(s, d))
      .withColumn("pred_lang", TA.predictedLang(col("toks")))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        r4(avg(TA.langScore(col("toks"), "en"))).as("avg_en_score"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  val langIdSql: String = {
    def mk(lang: String): String = {
      val arr = TA.langMarkers(lang).map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(toks, t -> list_contains($arr, t))) / CAST(greatest(len(toks), 1) AS DOUBLE)"
    }
    val langs = Seq("en", "es", "de", "fr", "zh")
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString(" ")
    s"""WITH tok AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
      |sc AS (SELECT doc_id, lang, ${langs.map(l => s"${mk(l)} AS s_$l").mkString(", ")} FROM tok),
      |b AS (SELECT *, $best AS best FROM sc),
      |p AS (SELECT doc_id, lang, s_en, CASE $cases ELSE 'und' END AS pred_lang FROM b)
      |SELECT lang, pred_lang, count(*) AS n_docs, ${r4Sql("avg(s_en)")} AS avg_en_score
      |FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
  }

  /** Token counting: whitespace tokens, regex (BPE-ish) tokens, chars/4
    * estimate.
    */
  def tokenCount: Q = (s, d) => {
    withToks(Tables.documents(s, d))
      .select(
        col("doc_id"),
        size(col("toks")).as("ws_tokens"),
        TA.regexTokenCount(col("text")).as("re_tokens"),
        TA.bpeTokenEstimate(col("text")).as("bpe_est"))
      .orderBy(col("doc_id"))
  }

  val tokenCountSql: String =
    s"""SELECT doc_id,
      |  CAST(len($toksSql) AS INTEGER) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS re_tokens,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: winnowing (k=3-word shingles, window w=4)
    * with the portable md5-based hash.
    */
  def docFingerprint: Q = (s, d) => {
    TA.withWinnowFingerprintsNative(Tables.documents(s, d),
        "text", k = 3, w = 4, out = "fps")
      .select(
        col("doc_id"),
        size(col("fps")).as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"))
      .orderBy(col("doc_id"))
  }

  val docFingerprintSql: String = {
    val sh = TA.shinglesSql("toks", 3)
    val h = Hashing.md5LongSql("s")
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
      |hs AS (SELECT doc_id, list_transform($sh, s -> $h) AS hashes FROM tok),
      |win AS (SELECT doc_id, list_distinct(list_transform(
      |   generate_series(1, greatest(len(hashes) - 3, 1)),
      |   i -> list_min(hashes[i:i+3]))) AS fps FROM hs)
      |SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fp,
      |  list_min(fps) AS fp_min, list_max(fps) AS fp_max
      |FROM win ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------- character entropy

  /** Shannon character entropy per document — the gibberish/repetition
    * screen (low entropy = character-level boilerplate like padded runs,
    * mojibake floods; normal prose sits near 4 bits/char). Docs with
    * doc_id % 11 == 0 get a 400-char `z` run appended so the fixture
    * contains true positives.
    *
    * SCALE: one fused native call per document (`graft_char_entropy`,
    * codegen'd, integer micro-bit output) — a pure scan-side projection.
    * The unnest formulation the oracle replays fans out one row per
    * CHARACTER (~avg-doc-length × corpus multiplier through two
    * aggregations); the kernel keeps that entirely inside the row.
    */
  def charEntropy: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" "), repeat(lit("z"), 400)))
          .otherwise(col("text")).as("text"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        call_function("graft_char_entropy", col("text")).as("entropy_micro"))
      .select(col("doc_id"), col("n_chars"), col("entropy_micro"),
        Num.roundAt(4)(col("entropy_micro").cast("double") / 1000000.0)
          .as("entropy_bits"),
        (col("entropy_micro") < 3000000L).as("is_gibberish"))
      .orderBy(col("doc_id"))

  val charEntropySql: String =
    s"""WITH base AS (SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN text || ' ' || repeat('z', 400)
      |         ELSE text END AS text
      |  FROM documents),
      |ch AS (SELECT doc_id, len(text) AS n, text,
      |    unnest(generate_series(1, len(text))) AS i FROM base),
      |cc AS (SELECT doc_id, n, substring(text, CAST(i AS INTEGER), 1) AS c
      |  FROM ch),
      |cnt AS (SELECT doc_id, n, c, count(*) AS k FROM cc GROUP BY 1, 2, 3),
      |term AS (SELECT doc_id, n,
      |    CAST(round(-(CAST(k AS DOUBLE) / n)
      |      * (ln(CAST(k AS DOUBLE) / n) / ln(2)) * 1000000) AS BIGINT) AS tm
      |  FROM cnt)
      |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
      |  CAST(sum(tm) AS BIGINT) AS entropy_micro,
      |  ${Num.roundAtSql(4, "CAST(sum(tm) AS DOUBLE) / 1000000.0")} AS entropy_bits,
      |  sum(tm) < 3000000 AS is_gibberish
      |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- vocabulary / OOV rate

  private val VocabSize = 200

  /** Tokenizer-coverage audit: the top-[[VocabSize]] corpus vocabulary by
    * frequency (tie-broken by token — any top-k the gate hashes needs a
    * total order), then each document's out-of-vocabulary token count and
    * rate. The pre-training use: estimate how much of a candidate corpus
    * a fixed vocab/tokenizer covers before committing GPU-hours to it.
    *
    * SCALE: vocab building is a partial-aggregated token count + a
    * TakeOrderedAndProject top-k — never a global sort. The vocab
    * (KB-sized by construction) then BROADCASTS into a left-anti join
    * against the exploded token stream, so the membership test rides the
    * scan; per-doc rollup is one partial-agged shuffle on doc_id. The
    * corpus-sized token stream is never joined against anything
    * non-broadcast.
    */
  def oovRate: Q = (s, d) => {
    val docs = withToks(Tables.documents(s, d))
      .select(col("doc_id"), col("toks"))
    val toksE = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
    val vocab = toksE.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(VocabSize)
      .select(col("tok"))
    val oov = toksE.join(broadcast(vocab), Seq("tok"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_oov"))
    docs.select(col("doc_id"), size(col("toks")).as("n_tokens"))
      .join(oov, Seq("doc_id"), "left").na.fill(0L, Seq("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        r4(col("n_oov") / greatest(col("n_tokens"), lit(1)).cast("double"))
          .as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  val oovRateSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
      |t AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
      |vocab AS (SELECT tok FROM
      |  (SELECT tok, count(*) AS n FROM t GROUP BY tok
      |   ORDER BY n DESC, tok LIMIT $VocabSize)),
      |oov AS (SELECT doc_id, count(*) AS n_oov FROM t
      |  WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY doc_id)
      |SELECT k.doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
      |  CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
      |  ${r4Sql("coalesce(n_oov, 0) / CAST(greatest(len(toks), 1) AS DOUBLE)")} AS oov_rate
      |FROM tok k LEFT JOIN oov USING (doc_id) ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- text canonicalization

  /** Accented decoration appended to every 7th doc so the fixture (pure
    * ASCII) actually exercises the diacritic path; ł/ß survive by design
    * (no canonical decomposition).
    */
  private val AccentSuffix = " Café NAÏVE  São  Paulo żółć ÉCLAIR Straße"

  /** Corpus text canonicalization — the normalize-before-everything step
    * (dedup keys, vocab building, decontamination probes all assume it):
    * strip diacritics (NFD → drop Mn marks → NFC, [[graft.functions.Unaccent]]),
    * lowercase, collapse whitespace runs, trim. Emits the normalized
    * text's md5/length plus a changed flag.
    *
    * SCALE: pure scan-side projection — the unaccent kernel is a
    * codegen'd native expression (no UDF boundary), the rest is builtin
    * string functions; zero shuffles before the presentation sort.
    * Cross-engine note: Java's NFD+strip-Mn agrees with DuckDB's
    * `strip_accents` on the shared domain (probed: ż→z but ł stays,
    * ß stays, CJK passes through), which is what makes the gate possible.
    */
  def textNormalize: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(AccentSuffix)))
          .otherwise(col("text")).as("raw"))
      .select(col("doc_id"),
        trim(regexp_replace(
          lower(call_function("graft_unaccent", col("raw"))),
          "\\s+", " ")).as("norm"),
        col("raw"))
      .select(col("doc_id"),
        length(col("norm")).as("norm_len"),
        md5(col("norm")).as("norm_md5"),
        (col("norm") =!= col("raw")).as("changed"))
      .orderBy(col("doc_id"))

  val textNormalizeSql: String =
    s"""WITH raw AS (SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || '$AccentSuffix' ELSE text END AS raw
      |  FROM documents),
      |n AS (SELECT doc_id, raw,
      |    trim(regexp_replace(lower(strip_accents(nfc_normalize(raw))),
      |      '\\s+', ' ', 'g')) AS norm
      |  FROM raw)
      |SELECT doc_id, CAST(length(norm) AS INTEGER) AS norm_len,
      |  md5(norm) AS norm_md5, norm <> raw AS changed
      |FROM n ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- frequency spectrum

  /** Zipf frequency spectrum of the corpus vocabulary: how many distinct
    * tokens occur ~2^b times (bucket = bit length of the count — integer
    * arithmetic via `length(bin(n))` on BOTH engines, because
    * `floor(log2(n))` computed as ln-ratio lands on exact powers of two
    * with float error). The corpus-health diagnostic: a natural corpus is
    * Zipfian (long singleton tail, few hot tokens); a bot-flooded or
    * template-heavy crawl shows a bulge in the mid buckets.
    *
    * SCALE: two partial-aggregated shuffles — token counts (the exploded
    * stream combines map-side) then bucket rollup over the vocabulary-
    * sized result. Nothing corpus-sized crosses the wire twice.
    */
  def freqSpectrum: Q = (s, d) => {
    // union a second text field (customer names — unique per row) so the
    // fixture's spectrum spans all regimes: singleton tail AND hot head
    val toks = withToks(Tables.documents(s, d))
      .select(explode(col("toks")).as("tok"))
      .unionByName(Tables.customer(s, d)
        .select(explode(TA.tokens(col("c_name"))).as("tok")))
    toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .select(length(bin(col("n"))).as("freq_bucket"), col("n"))
      .groupBy(col("freq_bucket"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n")).as("n_occurrences"))
      .orderBy(col("freq_bucket"))
  }

  val freqSpectrumSql: String =
    s"""WITH t AS (SELECT unnest($toksSql) AS tok FROM documents
      |  UNION ALL SELECT unnest(${TA.tokensSql("c_name")}) AS tok FROM customer),
      |c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok)
      |SELECT CAST(length(bin(n)) AS INTEGER) AS freq_bucket,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(n) AS BIGINT) AS n_occurrences
      |FROM c GROUP BY 1 ORDER BY freq_bucket""".stripMargin

  // ------------------------------------------------- BPE pair statistics

  private val BpeTop = 10

  /** The distributed kernel of a BPE tokenizer trainer: corpus-weighted
    * adjacent-symbol pair counts, i.e. the statistic the first merge
    * round argmaxes over. The BPE efficiency trick is structural: pairs
    * are enumerated over the DISTINCT-WORD table weighted by word
    * frequency — vocab-sized work (tens of thousands of rows at any
    * corpus size) instead of a pass over the raw token stream, which is
    * why production BPE trainers keep a word-frequency table, not the
    * corpus. Output: the top-10 merge candidates with exact weights
    * (pair tie-break — any argmax the gate hashes needs a total order).
    *
    * SCALE: one partial-aggregated shuffle builds the word-frequency
    * table from the token stream; everything after (char-pair explode ×
    * vocab, pair rollup, top-k) is vocabulary-sized. Counts are exact
    * longs.
    */
  def bpePairs: Q = (s, d) => {
    val words = withToks(Tables.documents(s, d))
      .select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val pairs = words
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(concat(col("word").substr(col("i"), lit(1)), lit(" "),
          col("word").substr(col("i") + 1, lit(1))).as("pair"),
        col("freq"))
    pairs.groupBy(col("pair")).agg(sum(col("freq")).as("weight"))
      .orderBy(col("weight").desc, col("pair").asc).limit(BpeTop)
  }

  val bpePairsSql: String =
    s"""WITH w AS (SELECT tok AS word, count(*) AS freq FROM
      |    (SELECT unnest($toksSql) AS tok FROM documents) GROUP BY tok),
      |p AS (SELECT substring(word, CAST(i AS INTEGER), 1) || ' ' ||
      |      substring(word, CAST(i AS INTEGER) + 1, 1) AS pair, freq
      |  FROM w CROSS JOIN unnest(generate_series(1, len(word) - 1)) AS t(i)
      |  WHERE len(word) >= 2)
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS weight
      |FROM p GROUP BY pair ORDER BY weight DESC, pair ASC LIMIT $BpeTop""".stripMargin

  // ----------------------------------------------- full BPE train + encode

  private val BpeMerges = 8
  private val BpeTopWords = 15

  /** The complete BPE training loop ([[graft.ops.Bpe]]): 8 merge rounds
    * over the word-frequency table, each round an exact corpus-weighted
    * adjacent-pair argmax (weight desc, pair asc tie-break) followed by a
    * greedy left-to-right merge of the winning pair across the
    * vocabulary. Output: the ordered merge table — the MODEL a BPE
    * tokenizer ships. The oracle replays the identical 8 rounds as
    * unrolled SQL stages, so every argmax and every merge application
    * must agree bit-for-bit across engines.
    *
    * SCALE: one corpus-sized shuffle builds the frequency table; each
    * round after that is two vocabulary-sized jobs + a 1-row collect
    * (the merge table is driver-state by design — it IS the model, a
    * few hundred strings, exactly like production trainers).
    */
  def bpeTrain: Q = (s, d) => {
    val merges = graft.ops.Bpe.train(
      graft.ops.Bpe.wordFreq(Tables.documents(s, d), "text"), BpeMerges)
    import s.implicits._
    merges.zipWithIndex
      .map { case ((pa, pb, w), i) => (i, pa, pb, w) }
      .toDF("round", "pa", "pb", "weight")
      .select(col("round").cast("int"), col("pa"), col("pb"), col("weight"))
      .orderBy(col("round"))
  }

  /** BPE ENCODE with the trained merges: the top-15 words by corpus
    * frequency, each re-tokenized by applying the 8 merges in training
    * order (greedy, non-overlapping — the wrapped-sentinel `replace`
    * trick makes the fold a codegen'd string primitive, see
    * [[graft.ops.Bpe]]). Output pins the full segmentation (`encoding`)
    * and the token count per word; the oracle re-derives both from its
    * own 8-stage replay.
    *
    * SCALE: encode is a zero-shuffle projection — one `replace` per
    * merge fused into a single whole-stage-codegen'd scan, so tokenizing
    * a 100 TB corpus costs exactly one pass.
    */
  def bpeEncode: Q = (s, d) => {
    val B = graft.ops.Bpe
    val wf = B.wordFreq(Tables.documents(s, d), "text")
    val merges = B.train(wf, BpeMerges)
    wf.orderBy(col("freq").desc, col("word").asc).limit(BpeTopWords)
      .withColumn("s", B.encode(B.wrapChars(col("word")), merges))
      .select(col("word"), col("freq"),
        B.tokenCount(col("s")).as("n_tokens"),
        B.render(col("s")).as("encoding"))
      .orderBy(col("freq").desc, col("word").asc)
  }

  /** Unrolled-round CTE prefix shared by the two BPE oracles: wf → v0,
    * then per round i: pair stats (p_i) → argmax (m_i) → merged vocab
    * (v_{i+1}), mirroring the Spark loop stage for stage.
    */
  private def bpeCtes(n: Int): String = {
    val sb = new StringBuilder
    sb ++= """wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM
      |    (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      |     FROM documents) WHERE word <> '' GROUP BY word),
      |v0 AS (SELECT word, freq,
      |  regexp_replace(word, '(.)', chr(1)||'\1'||chr(2), 'g') AS s FROM wf)""".stripMargin
    (0 until n).foreach { i =>
      sb ++= s""",
      |y$i AS (SELECT freq, string_split(trim(s, chr(1)||chr(2)), chr(2)||chr(1)) AS y
      |  FROM v$i),
      |p$i AS (SELECT y[i] AS pa, y[i+1] AS pb, CAST(sum(freq) AS BIGINT) AS w
      |  FROM y$i CROSS JOIN unnest(generate_series(1, len(y)-1)) AS t(i)
      |  WHERE len(y) >= 2 GROUP BY pa, pb),
      |m$i AS (SELECT pa, pb, w FROM p$i ORDER BY w DESC, pa ASC, pb ASC LIMIT 1),
      |v${i + 1} AS (SELECT word, freq,
      |  coalesce(replace(s, chr(1)||m$i.pa||chr(2)||chr(1)||m$i.pb||chr(2),
      |    chr(1)||m$i.pa||m$i.pb||chr(2)), s) AS s
      |  FROM v$i LEFT JOIN m$i ON true)""".stripMargin
    }
    sb.toString
  }

  val bpeTrainSql: String = {
    val rounds = (0 until BpeMerges)
      .map(i => s"SELECT $i AS round, pa, pb, w AS weight FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeCtes(BpeMerges)}
      |SELECT CAST(round AS INTEGER) AS round, pa, pb, weight
      |FROM ($rounds) ORDER BY round""".stripMargin
  }

  val bpeEncodeSql: String =
    s"""WITH ${bpeCtes(BpeMerges)}
      |SELECT word, freq,
      |  CAST(len(s) - len(replace(s, chr(1), '')) AS INTEGER) AS n_tokens,
      |  replace(trim(s, chr(1)||chr(2)), chr(2)||chr(1), ' ') AS encoding
      |FROM v$BpeMerges
      |ORDER BY freq DESC, word ASC LIMIT $BpeTopWords""".stripMargin

  // ------------------------------------------------------- BM25 relevance

  private val BmTerms = Seq("hash", "join", "vector")

  /** BM25 relevance (k1=1.2, b=0.75) of every document for a fixed query,
    * plus the matched-term count — corpus-relevance scoring for retrieval
    * filtering / quality mixing in a training pipeline.
    *
    * Shape at scale: corpus stats (N, avgdl) are two driver scalars (the
    * reference's own percentage-of-total pattern); candidate docs are
    * pruned SCAN-SIDE with `arrays_overlap` before the explode so only
    * docs containing a query term shuffle; per-term document frequencies
    * are a tiny broadcast. Per-doc scores sum the per-term weights in
    * FIXED term order (conditional max per term, not sum over rows) so the
    * double result is independent of row arrival order — same discipline
    * as Num's integer-cents sums.
    */
  def bm25: Q = (s, d) => {
    // tokenized once, consumed by both the corpus-stats pass and the
    // term-frequency pass — materialize instead of re-tokenizing
    val toksDf = Tables.documents(s, d)
      .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
      .transform(graft.core.Checkpoint.apply)
    val st = toksDf.agg(
      sum(col("dl")).cast("double").as("s"),
      count(lit(1)).cast("double").as("n")).first()
    val nDocs = st.getDouble(1)
    val avgdl = st.getDouble(0) / nDocs
    val tf = toksDf
      .filter(arrays_overlap(col("toks"), array(BmTerms.map(lit): _*)))
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(BmTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val w = tf.join(broadcast(dfTab), "term")
      .withColumn("idf",
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("w",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
    w.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_hits"),
        round(BmTerms.map(t =>
            coalesce(max(when(col("term") === t, col("w"))), lit(0.0)))
          .reduce(_ + _), 4).as("bm25"))
      .orderBy(col("doc_id"))
  }

  val bm25Sql: String = {
    val terms = BmTerms.map(t => s"'$t'").mkString(", ")
    val perTerm = BmTerms.map(t =>
      s"coalesce(max(CASE WHEN term = '$t' THEN w END), 0.0)").mkString(" + ")
    s"""WITH dl AS (SELECT doc_id, len(toks) AS dl, toks
      |    FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, dl, t AS term, count(*) AS tf
      |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM dl)
      |  WHERE t IN ($terms) GROUP BY 1, 2, 3),
      |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |w AS (SELECT doc_id, term,
      |    ln((s.n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
      |      (tf + 1.2 * (0.25 + 0.75 * dl / s.avgdl)) AS w
      |  FROM tf JOIN df USING (term) CROSS JOIN stats s)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
      |  round($perTerm, 4) AS bm25
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Terms the index/tf-idf queries cover — a fixed vocabulary slice, the
    * shape of a search-engine dictionary shard.
    */
  private val IdxTerms = Seq("spark", "merge", "window", "stream", "filter")

  /** Inverted-index build: term → (document frequency, total term
    * frequency, capped sorted posting list). The posting list is the
    * search-engine primitive; the cap (20 ids) bounds row width the same
    * way real indexes shard long postings. One explode + one aggregate;
    * `sort_array` makes the collect order deterministic under any
    * partitioning.
    */
  def invertedIndex: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), explode(TA.tokens(col("text"))).as("term"))
      .filter(col("term").isin(IdxTerms: _*))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        array_join(slice(sort_array(collect_list(col("doc_id"))), 1, 20), ",")
          .as("posting_head"))
      .orderBy(col("term"))
  }

  val invertedIndexSql: String = {
    val terms = IdxTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tf AS (SELECT term, doc_id, count(*) AS tf
      |  FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
      |  WHERE term IN ($terms) GROUP BY 1, 2)
      |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
      |  array_to_string((list_sort(list(doc_id)))[1:20], ',') AS posting_head
      |FROM tf GROUP BY term ORDER BY term""".stripMargin
  }

  /** Integer tf-idf ranking: per term, the top-3 documents by score
    * `tf * idf_micro` where `idf_micro = (N * 1e6) div df` — the engine's
    * order-independent integer discipline applied to relevance scoring
    * (ties break on doc_id). No floats anywhere, so ranks are bit-stable
    * at any cluster size and the full score column hash-matches.
    */
  def tfidfTopk: Q = (s, d) => {
    val nDocs = Tables.documents(s, d).count()
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(TA.tokens(col("text"))).as("term"))
      .filter(col("term").isin(IdxTerms: _*))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf_micro", expr(s"(${nDocs}L * 1000000L) div df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id").asc)
    tf.join(broadcast(dfTab), "term")
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("term"), col("rnk"), col("doc_id"), col("tf"),
        col("df"), col("score_micro"))
      .orderBy(col("term"), col("rnk"))
  }

  val tfidfTopkSql: String = {
    val terms = IdxTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
      |  WHERE term IN ($terms) GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df,
      |    ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_micro
      |  FROM tf GROUP BY term),
      |ranked AS (SELECT tf.term, tf.doc_id, tf.tf, df.df,
      |    CAST(tf.tf * df.idf_micro AS BIGINT) AS score_micro,
      |    row_number() OVER (PARTITION BY tf.term
      |      ORDER BY tf.tf DESC, tf.doc_id) AS rnk
      |  FROM tf JOIN df USING (term))
      |SELECT term, CAST(rnk AS INTEGER) AS rnk, doc_id, tf, df, score_micro
      |FROM ranked WHERE rnk <= 3 ORDER BY term, rnk""".stripMargin
  }

  /** Custom GENERATOR expression gated end-to-end: `graft_ngram_explode`
    * (a Catalyst `Generator`, the table-function extension point) streams
    * (pos, shingle) rows per document WITHOUT materializing the shingle
    * array the `explode(graft_shingles(...))` composition builds — peak
    * per-row memory drops from O(tokens×n) to O(n), which is the
    * difference on book-length documents at corpus scale. The rows feed
    * straight into a partial-aggregated trigram census; the oracle
    * rebuilds the same shingles relationally.
    */
  def ngramGenerate: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), expr("graft_ngram_explode(text, 3)"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("df"),
        min(col("pos").cast("long")).as("first_pos"))
      .orderBy(col("n").desc, col("shingle"))
      .limit(20)
  }

  val ngramGenerateSql: String = {
    val toksSql = TA.tokensSql("text")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS toks FROM documents),
      |sh AS (SELECT doc_id, i - 1 AS pos,
      |    array_to_string(toks[i:i+2], ' ') AS shingle
      |  FROM toks CROSS JOIN
      |    unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i))
      |SELECT shingle, count(*) AS n, count(DISTINCT doc_id) AS df,
      |  min(pos) AS first_pos
      |FROM sh GROUP BY shingle
      |ORDER BY n DESC, shingle LIMIT 20""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_ngram_generate" -> ngramGenerate,
    "q_text_stats" -> textStats,
    "q_lang_id" -> langId,
    "q_token_count" -> tokenCount,
    "q_doc_fingerprint" -> docFingerprint,
    "q_char_entropy" -> charEntropy,
    "q_oov_rate" -> oovRate,
    "q_freq_spectrum" -> freqSpectrum,
    "q_text_normalize" -> textNormalize,
    "q_bpe_pairs" -> bpePairs,
    "q_bpe_train" -> bpeTrain,
    "q_bpe_encode" -> bpeEncode,
    "q_bm25" -> bm25,
    "q_inverted_index" -> invertedIndex,
    "q_tfidf_topk" -> tfidfTopk,
  )

  val oracles: Map[String, String] = Map(
    "q_ngram_generate" -> ngramGenerateSql,
    "q_text_stats" -> textStatsSql,
    "q_lang_id" -> langIdSql,
    "q_token_count" -> tokenCountSql,
    "q_doc_fingerprint" -> docFingerprintSql,
    "q_char_entropy" -> charEntropySql,
    "q_oov_rate" -> oovRateSql,
    "q_freq_spectrum" -> freqSpectrumSql,
    "q_text_normalize" -> textNormalizeSql,
    "q_bpe_pairs" -> bpePairsSql,
    "q_bpe_train" -> bpeTrainSql,
    "q_bpe_encode" -> bpeEncodeSql,
    "q_bm25" -> bm25Sql,
    "q_inverted_index" -> invertedIndexSql,
    "q_tfidf_topk" -> tfidfTopkSql,
  )
}
