package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer, trained and applied as dataframe
  * transformations (Sennrich et al., "Neural Machine Translation of Rare
  * Words with Subword Units" — the BPE algorithm GPT-2/LLaMA-family
  * tokenizers build on).
  *
  * The structural trick production trainers use is kept: every round
  * works on the WORD-FREQUENCY table (vocabulary-sized — tens of
  * thousands of rows at any corpus size), never the raw token stream, so
  * training cost is independent of corpus bytes once the one
  * corpus-sized aggregation has built the frequency table.
  *
  * Words are represented as a flat string of WRAPPED symbols —
  * `\u0001 sym \u0002` per symbol — because with distinct start/end
  * sentinels a merge of pair (a,b) is EXACTLY
  * `replace(s, wrap(a)+wrap(b), wrap(ab))`: left-to-right,
  * non-overlapping, boundary-safe (a symbol whose text merely ends in
  * `a` can never false-match), which is the reference greedy-merge fold
  * — and `replace` is a codegen'd string primitive in both Spark and the
  * DuckDB oracle, so the whole tokenizer is hash-gatable cross-engine.
  * Words are restricted to lowercase alpha runs so the sentinels can
  * never collide with content.
  *
  * Each training round is two vocabulary-sized jobs (adjacent-pair
  * stats + a 1-row argmax collect); the merge table itself lives on the
  * driver — it IS the model (a few hundred strings), exactly like
  * production BPE trainers.
  */
object Bpe {

  /** Symbol start/end sentinels (never appear in [a-z]+ content). */
  val S = "\u0001"
  val E = "\u0002"

  private def wrap(sym: String): String = S + sym + E

  /** Seed encoding: every character its own wrapped symbol. */
  def wrapChars(word: Column): Column =
    regexp_replace(word, "(.)", S + "$1" + E)

  /** Lowercase-alpha word frequency table over `textCol` — the ONE
    * corpus-sized pass; everything after is vocabulary-sized.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train `nMerges` merges over a (word, freq) table. Returns the
    * ordered merge list [(left, right, weight)] — ties broken (weight
    * desc, left asc, right asc) so the model is identical across
    * engines and partitionings. Stops early if no adjacent pair remains.
    */
  def train(wordFreq: DataFrame, nMerges: Int): Seq[(String, String, Long)] = {
    var vocab = wordFreq
      .select(col("freq"), wrapChars(col("word")).as("s"))
      .transform(graft.core.Checkpoint.apply)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var exhausted = false
    for (_ <- 0 until nMerges if !exhausted) {
      val sy = vocab
        .withColumn("y", split(trim(col("s"), S + E), E + S))
        .filter(size(col("y")) >= 2)
      val best = sy
        .select(col("freq"), explode(sequence(lit(1), size(col("y")) - 1)).as("i"),
          col("y"))
        .select(col("freq"), element_at(col("y"), col("i")).as("pa"),
          element_at(col("y"), col("i") + 1).as("pb"))
        .groupBy(col("pa"), col("pb")).agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("pa").asc, col("pb").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (pa, pb, w) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((pa, pb, w))
        vocab = vocab
          .withColumn("s", applyMerge(col("s"), pa, pb))
          .transform(graft.core.Checkpoint.apply)
      }
    }
    merges.toList
  }

  private def applyMerge(s: Column, pa: String, pb: String): Column =
    call_function("replace", s, lit(wrap(pa) + wrap(pb)), lit(wrap(pa + pb)))

  /** Apply a trained merge list, in training order, to a wrapped
    * encoding — the BPE ENCODE step. One `replace` per merge, all fused
    * into one codegen'd projection: encoding a 100 TB corpus is a single
    * scan with zero shuffles.
    */
  def encode(wrapped: Column, merges: Seq[(String, String, Long)]): Column =
    merges.foldLeft(wrapped) { case (c, (a, b, _)) => applyMerge(c, a, b) }

  /** Token count of a wrapped encoding (= number of start sentinels). */
  def tokenCount(s: Column): Column =
    (length(s) - length(call_function("replace", s, lit(S), lit("")))).cast("int")

  /** Human/oracle-comparable rendering: symbols joined by one space. */
  def render(s: Column): Column =
    call_function("replace", trim(s, S + E), lit(E + S), lit(" "))
}
