package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-corpus analysis primitives for training-data pipelines: tokenizing,
  * quality scoring, language-ID heuristics, token counting, and document
  * fingerprinting (winnowing). All pure `Column` expressions — scan-side,
  * shuffle-free, and linear in corpus size, so they hold at 100 TB: each
  * document is scored independently in the scan's projection. (The
  * higher-order lambdas evaluate interpreted, not codegen'd — the cost is
  * per-token closure calls, not extra stages; PlanSpec pins the
  * single-Exchange plan shape.)
  *
  * The reference pipeline has no text ops (it is a FAERS star schema); these
  * are the beyond-parity training-data operators the engine adds
  * (SURVEY.md §7.5 north star).
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped (stable across engines even when
    * the text has leading/double spaces). Splits on the `\s+` CLASS — a
    * literal-space split would glue newline/tab-separated words into
    * mega-tokens and silently skew every downstream quality/dedup signal on
    * real (newline-heavy) corpora.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Word n-gram shingles joined by a single space. For a token array of
    * size s yields max(s - n + 1, 1) shingles (short docs produce one
    * truncated shingle rather than none, so every doc gets a signature).
    */
  def shingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => array_join(slice(toks, i, lit(n)), " "))

  /** DuckDB fragments mirroring the above (1-based, inclusive list slices). */
  def tokensSql(text: String): String =
    s"""list_filter(string_split_regex($text, '\\s+'), t -> t <> '')"""
  def shinglesSql(toks: String, n: Int): String =
    s"list_transform(generate_series(1, greatest(len($toks) - ${n - 1}, 1)), " +
      s"i -> array_to_string($toks[i:i+${n - 2 + 1}], ' '))"

  /** Default stopword list (shared with the oracle SQL). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  def stopwordRatio(toks: Column, words: Seq[String] = stopwords): Column = {
    val sw = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Mean token length in characters. */
  def avgTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1))

  /** Type-token ratio (vocabulary richness). */
  // zero-token guards: an empty doc must score 0, not null — a null
  // quality score passes every `< threshold` junk filter unnoticed
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / greatest(size(toks), lit(1))

  /** Fraction of non-word, non-space characters. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^\\w\\s]")).cast("double") /
      greatest(length(text), lit(1))

  /** Composite quality score in [0,1]: favors mid-length docs with healthy
    * stopword presence, low punctuation noise, and vocabulary variety.
    * Deliberately a closed-form formula (no model) so it is oracle-checkable
    * and runs inside codegen.
    */
  def qualityScore(text: Column, toks: Column): Column = {
    val lenScore = least(size(toks).cast("double") / 100.0, lit(1.0))
    val swScore  = least(stopwordRatio(toks) * 5.0, lit(1.0))
    val ttrScore = typeTokenRatio(toks)
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 10.0, lit(0.0))
    (lenScore * 0.3 + swScore * 0.2 + ttrScore * 0.3) * punctPenalty +
      punctPenalty * 0.2
  }

  /** Per-language marker-word lists for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: a broadcast-free literal array comparison.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(toks: Column, lang: String): Column = {
    val mk = array(langMarkers(lang).map(lit): _*)
    size(filter(toks, t => array_contains(mk, t))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Argmax over language scores; ties resolve in `langs` order; all-zero
    * scores fall back to "und" (undetermined).
    */
  def predictedLang(toks: Column, langs: Seq[String] = Seq("en", "es", "de", "fr", "zh")): Column = {
    val scores = langs.map(l => (l, langScore(toks, l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, sc), acc) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Regex-token count — a BPE-ish segmentation: letter runs, digit runs,
    * and single punctuation marks each count as one token.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Cheap BPE token estimate (chars/4 heuristic used by tokenizer docs). */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): hash each k-word
    * shingle, slide a window of `w` hashes, keep each window's minimum, and
    * dedupe. Robust to local edits; the fingerprint set is a compact
    * document sketch for plagiarism/near-dup detection.
    *
    * Perf shape: the shingle hashes are materialized once per row, then the
    * window minima come from a log2(w) zip_with/least doubling chain
    * (m[i] = min over span 2^j) — each level materialized as its own
    * projection column so nothing re-hashes per window. An index-slice
    * formulation (`transform(sequence(...), i -> array_min(slice(h, i, w)))`)
    * re-evaluates the hash array per window: O(docLen * w) md5 calls per
    * row, which benchmarked 30x slower at sf0.1.
    *
    * `w` must be a power of two (doubling chain); `out` gets the distinct
    * fingerprint array.
    */
  def withWinnowFingerprints(df: org.apache.spark.sql.DataFrame, toksCol: String,
                             k: Int, w: Int, out: String,
                             hash: Column => Column = Hashing.md5Long)
  : org.apache.spark.sql.DataFrame =
    winnowFromHashes(
      df.withColumn("_wm", transform(shingles(col(toksCol), k), s => hash(s))),
      w, out)

  /** [[withWinnowFingerprints]] with the shingle hashing done by the native
    * fused `graft_shingle_hashes` expression (one codegen'd call per doc
    * instead of one interpreted md5 chain per shingle) — identical
    * fingerprints, asserted in TextHashSpec. The window-minimum chain and
    * fingerprint slice run off the hash array's own length: `|hashes| =
    * max(|toks| - k + 1, 1)`, so `|toks| - (k-1) - (w-1)` equals
    * `|hashes| - (w-1)` whenever a full window exists and both collapse to
    * the 1-floor otherwise.
    */
  def withWinnowFingerprintsNative(df: org.apache.spark.sql.DataFrame,
                                   textCol: String, k: Int, w: Int, out: String)
  : org.apache.spark.sql.DataFrame =
    winnowFromHashes(
      df.withColumn("_wm", call_function("graft_shingle_hashes", col(textCol), lit(k))),
      w, out)

  /** Shared winnowing tail: log2(w) zip_with/least doubling levels over the
    * materialized `_wm` hash column, then the distinct window-min slice.
    * (zip_with pads the shorter slice with nulls and `least` skips them, so
    * `_wm` keeps its original length at every level.)
    */
  private def winnowFromHashes(df0: org.apache.spark.sql.DataFrame,
                               w: Int, out: String)
  : org.apache.spark.sql.DataFrame = {
    require(w > 0 && (w & (w - 1)) == 0, s"window w=$w must be a power of two")
    val nHashes = size(col("_wm"))
    var d = df0
    var span = 1
    while (span < w) {
      d = d.withColumn("_wm",
        zip_with(col("_wm"),
          slice(col("_wm"), lit(span + 1), greatest(size(col("_wm")) - span, lit(1))),
          (a, b) => least(a, b)))
      span *= 2
    }
    d.withColumn(out, array_distinct(
        slice(col("_wm"), lit(1), greatest(nHashes - (w - 1), lit(1)))))
      .drop("_wm")
  }
}
