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
    *
    * BATCHED rounds, IDENTICAL model: one merge per distributed job is
    * 500 driver round-trips for a 500-merge model, so each round collects
    * the top of the ranked pair table and accepts a PREFIX of it — up to
    * `batchK` merges per job — under conditions that make the batch
    * provably equal to running the rounds one at a time:
    *
    *  - a candidate must be symbol-disjoint from every pair accepted
    *    earlier in the batch (merging (a,b) only changes counts of pairs
    *    touching `a`, `b`, or the new `ab`; a disjoint pair's count — and
    *    its (w, pa, pb) tie-break tuple — is invariant);
    *  - every pair that DOES conflict with the accepted set must weigh
    *    STRICTLY less than the candidate. Any pair a merge creates or
    *    grows derives from a conflicting source pair occurrence — e.g.
    *    each (x, ab) occurrence was an (x, a) occurrence — so its
    *    post-merge weight is bounded by that source's pre-merge weight.
    *    A strict gap therefore guarantees nothing can rise to tie-or-beat
    *    the candidate before its turn in the sequential order (ties are
    *    the dangerous case: a derived pair tying the weight could win the
    *    lexicographic tie-break);
    *  - if the collected top is a truncation of the pair table, the
    *    candidate must also weigh strictly more than the collection
    *    floor, bounding every unseen conflict the same way.
    *
    * The batch stops at the first rejected candidate (later ranks are
    * only the sequential successors if the whole prefix is). `batchK = 1`
    * restores the one-merge-per-job loop exactly.
    */
  def train(wordFreq: DataFrame, nMerges: Int,
            batchK: Int = 8): Seq[(String, String, Long)] = {
    var vocab = wordFreq
      .select(col("freq"), wrapChars(col("word")).as("s"))
      .transform(graft.core.Checkpoint.apply)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val collectN = math.max(batchK * 8, 16)
      val sy = vocab
        .withColumn("y", split(trim(col("s"), S + E), E + S))
        .filter(size(col("y")) >= 2)
      val top = sy
        .select(col("freq"), explode(sequence(lit(1), size(col("y")) - 1)).as("i"),
          col("y"))
        .select(col("freq"), element_at(col("y"), col("i")).as("pa"),
          element_at(col("y"), col("i") + 1).as("pb"))
        .groupBy(col("pa"), col("pb")).agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("pa").asc, col("pb").asc)
        .limit(collectN).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val truncated = top.length == collectN
        val floorW = top.last._3
        val maxAccept = math.min(math.max(batchK, 1), nMerges - merges.size)
        val accepted = scala.collection.mutable.ListBuffer(top.head)
        var acceptedSyms = Set(top.head._1, top.head._2)
        var i = 1
        var stop = false
        while (!stop && i < top.length && accepted.size < maxAccept) {
          val (pa, pb, w) = top(i)
          val disjoint = !acceptedSyms(pa) && !acceptedSyms(pb)
          // ties among still-collected pairs: only a conflict can rise
          val noConflictTie = top.drop(i + 1).forall { case (qa, qb, qw) =>
            qw < w || (!acceptedSyms(qa) && !acceptedSyms(qb))
          }
          val aboveFloor = !truncated || w > floorW
          if (disjoint && noConflictTie && aboveFloor) {
            accepted += ((pa, pb, w))
            acceptedSyms = acceptedSyms + pa + pb
            i += 1
          } else stop = true
        }
        merges ++= accepted
        vocab = vocab
          .withColumn("s", encode(col("s"), accepted.toList))
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
