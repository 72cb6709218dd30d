package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: greedy left-to-right merge fold over symbol
    * lists (the textbook formulation the wrapped-string `replace` trick
    * must be equivalent to).
    */
  private def refMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refEncode(word: String, merges: Seq[(String, String, Long)]): List[String] =
    merges.foldLeft(word.map(_.toString).toList) {
      case (syms, (a, b, _)) => refMerge(syms, a, b)
    }

  test("training reproduces the Sennrich worked example") {
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = Bpe.train(wf, 4)
    // round 1: 'es' appears in newest(6) + widest(3) = 9, the unique max;
    // round 2: 'es'+'t' = 9 again — the second merge consumes the first's
    // output, which is the iterative dependency the loop must thread
    assert(merges.take(2) == Seq(("e", "s", 9L), ("es", "t", 9L)), merges)
  }

  test("wrapped-string encode == greedy symbol-fold reference") {
    val words = Seq("alabama", "banana", "assessment", "mississippi",
      "lowest", "newest", "wide", "a", "zz", "bookkeeper")
    val wf = words.zipWithIndex.map { case (w, i) => (w, (i + 1).toLong) }
      .toDF("word", "freq")
    val merges = Bpe.train(wf, 6)
    assert(merges.nonEmpty)
    val got = wf.withColumn("s", Bpe.encode(Bpe.wrapChars(col("word")), merges))
      .select(col("word"), Bpe.render(col("s")).as("enc"),
        Bpe.tokenCount(col("s")).as("n"))
      .as[(String, String, Int)].collect()
      .map { case (w, e, n) => w -> ((e, n)) }.toMap
    words.foreach { w =>
      val ref = refEncode(w, merges)
      val (enc, n) = got(w)
      assert(enc == ref.mkString(" "), s"$w: spark=$enc ref=$ref")
      assert(n == ref.length, s"$w token count")
    }
  }

  test("batched training is merge-for-merge identical to one-at-a-time") {
    // real corpus: frequency skew, deep merge chains, plenty of ties
    val wf = Bpe.wordFreq(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"), "text")
    val seqModel = Bpe.train(wf, 24, batchK = 1)
    val batched = Bpe.train(wf, 24, batchK = 8)
    assert(batched == seqModel,
      s"batched=${batched.take(6)}... sequential=${seqModel.take(6)}...")
    // adversarial ties: every pair weight equal, chained symbols — the
    // conflict/tie guards must force one-merge batches, not a wrong prefix
    val tied = Seq(("abcd", 1L), ("bcda", 1L)).toDF("word", "freq")
    assert(Bpe.train(tied, 3, batchK = 8) == Bpe.train(tied, 3, batchK = 1))
  }

  test("overlapping pairs merge left-to-right, non-overlapping") {
    // 'aaa' with merge (a,a) must become [aa, a], never [a, aa] or [aa, aa]
    val wf = Seq(("aaa", 10L), ("aaaa", 1L)).toDF("word", "freq")
    val merges = Seq(("a", "a", 0L))
    val got = wf.withColumn("s", Bpe.encode(Bpe.wrapChars(col("word")), merges))
      .select(col("word"), Bpe.render(col("s")).as("enc"))
      .as[(String, String)].collect().toMap
    assert(got("aaa") == "aa a")
    assert(got("aaaa") == "aa aa")
  }
}
