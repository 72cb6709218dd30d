package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{Dedup, Hashing, TextAnalysis => TA}

/** The native fused text-hash expressions must be bit-identical to the HOF
  * formulations they replace — the HOF pipeline is the executable spec (and
  * stays what the DuckDB oracle mirrors), the native expression is the fast
  * path. Asserted over real corpus text plus the tokenizer edge cases.
  */
class TextHashSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val edges = Seq(
      (9001L, ""), // empty
      (9002L, "   \t\n  "), // whitespace-only
      (9003L, "one"), // fewer tokens than shingleN
      (9004L, "two words"),
      (9005L, "tab\tsep\nnewline\rcr  double  space"),
      (9006L, " leading and trailing "),
      (9007L, "unicode tökens naïve 文字 mixed"),
    ).toDF("doc_id", "text")
    real.unionByName(edges).localCheckpoint()
  }

  test("graft_shingles == TA.shingles(TA.tokens)") {
    val diff = docs
      .withColumn("a", call_function("graft_shingles", $"text", lit(3)))
      .withColumn("b", TA.shingles(TA.tokens($"text"), 3))
      .filter(not($"a" <=> $"b"))
    assert(diff.isEmpty, diff.select("doc_id", "a", "b").take(3).mkString("; "))
  }

  test("graft_shingle_hashes == md5Long over TA.shingles") {
    val diff = docs
      .withColumn("a", call_function("graft_shingle_hashes", $"text", lit(3)))
      .withColumn("b",
        transform(TA.shingles(TA.tokens($"text"), 3), s => Hashing.md5Long(s)))
      .filter(not($"a" <=> $"b"))
    assert(diff.isEmpty, diff.select("doc_id", "a", "b").take(3).mkString("; "))
  }

  test("graft_minhash == HOF withMinhashSignature") {
    val a = Dedup.withMinhashSignatureNative(docs, "text", numPerm = 8, shingleN = 3)
      .select($"doc_id", $"sigs".as("a"))
    val b = Dedup.withMinhashSignature(docs, "text", numPerm = 8, shingleN = 3)
      .select($"doc_id", $"sigs".as("b"))
    val diff = a.join(b, "doc_id").filter(not($"a" <=> $"b"))
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("graft_simhash == HOF simhashExpr") {
    val diff = docs
      .withColumn("a", call_function("graft_simhash", $"text", lit(32)))
      .withColumn("b", Dedup.simhashExpr($"text", 32))
      .filter(not($"a" <=> $"b"))
    assert(diff.isEmpty, diff.select("doc_id", "a", "b").take(3).mkString("; "))
  }

  test("native winnowing fingerprints == HOF withWinnowFingerprints") {
    val toks = docs.withColumn("toks", TA.tokens($"text"))
    val a = TA.withWinnowFingerprintsNative(docs, "text", k = 3, w = 4, out = "fps")
      .select($"doc_id", $"fps".as("a"))
    val b = TA.withWinnowFingerprints(toks, "toks", k = 3, w = 4, out = "fps")
      .select($"doc_id", $"fps".as("b"))
    val diff = a.join(b, "doc_id").filter(not($"a" <=> $"b"))
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("native expressions run inside whole-stage codegen, no silent fallback") {
    // fallback=false turns a Janino compile failure into a hard error, so
    // this proves the doGenCode bodies of every native expression actually
    // compile — otherwise Spark silently interprets and the perf claim lies
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = docs
        .withColumn("mh", call_function("graft_minhash", $"text", lit(3), lit(8)))
        .withColumn("sh", call_function("graft_simhash", $"text", lit(32)))
        .withColumn("sg", call_function("graft_shingles", $"text", lit(3)))
        .withColumn("shh", call_function("graft_shingle_hashes", $"text", lit(3)))
        .withColumn("z", call_function("graft_zorder",
          ($"doc_id" % 256).cast("long"), ($"doc_id" % 97).cast("long")))
      assert(out.count() == docs.count())
      // and the plan keeps them in a codegen'd (starred) Project
      val plan = out.queryExecution.executedPlan.toString
      val projLine = plan.linesIterator
        .find(l => l.contains("graft_minhash")).getOrElse("")
      assert(projLine.trim.startsWith("*"), s"not codegen'd: $projLine")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("null text stays null through every native expression") {
    val row = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(
        call_function("graft_minhash", $"text", lit(3), lit(8)).as("mh"),
        call_function("graft_simhash", $"text", lit(32)).as("sh"),
        call_function("graft_shingles", $"text", lit(3)).as("sg"),
        call_function("graft_shingle_hashes", $"text", lit(3)).as("shh"))
      .first()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }
}
