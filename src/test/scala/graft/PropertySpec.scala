package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.faers.Transforms
import graft.ops.{Dedup, ScaleJoins, TextAnalysis => TA}

/** Property-based invariants for the transform/dedup/join kernels.
  * ScalaCheck generators drive randomized inputs through the REAL Spark
  * expressions, batched into one local job per property (not per case).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val genDate: Gen[LocalDate] = for {
    y <- Gen.choose(1960, 2030)
    m <- Gen.choose(1, 12)
    dMax = LocalDate.of(y, m, 1).lengthOfMonth()
    d <- Gen.choose(1, dMax)
  } yield LocalDate.of(y, m, d)

  test("date repair: 8-digit roundtrips; 6/4-digit pin day/month to 01") {
    val dates = Gen.listOfN(80, genDate).sample.get
    val rows = dates.zipWithIndex.flatMap { case (d, i) =>
      val ymd = f"${d.getYear}%04d${d.getMonthValue}%02d${d.getDayOfMonth}%02d"
      Seq((i * 4L, ymd, d.toString),
        (i * 4L + 1, ymd.take(6), d.withDayOfMonth(1).toString),
        (i * 4L + 2, ymd.take(4), d.withDayOfYear(1).toString),
        (i * 4L + 3, "garbage" + i, null))
    }
    val df = rows.toDF("id", "raw", "expected")
    val out = Transforms.repairFaersDate(df, "raw", "got")
      .filter(coalesce($"got".cast("string"), lit("NULL")) =!=
        coalesce($"expected", lit("NULL")))
    assert(out.isEmpty, s"mismatches: ${out.collect().mkString(",")}")
  }

  test("numeric coercion accepts exactly ^[0-9]+\\.?[0-9]*$ and nothing else") {
    val good = Gen.listOfN(40, for {
      i <- Gen.choose(0L, 999999L)
      frac <- Gen.option(Gen.choose(0, 9999))
    } yield frac.map(f => s"$i.$f").getOrElse(i.toString)).sample.get
    val bad = Seq("-1", "1e5", "1.2.3", "NaN", "", " 1", "1 ", "+2", ".5", "abc")
    val df = (good.map((_, true)) ++ bad.map((_, false))).toDF("x", "ok")
    val out = Transforms.standardizeNumericFields(df, Seq("x"))
    assert(out.filter($"ok" && $"x".isNull).isEmpty)      // every good parses
    assert(out.filter(!$"ok" && $"x".isNotNull).isEmpty)  // every bad nulls
  }

  test("estimated jaccard is within [0,1] and exact-dup pairs estimate 1.0") {
    val texts = Gen.listOfN(30, Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
      .map(_.mkString(" "))).sample.get
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val both = df.unionByName(df.select(($"id" + 1000).as("id"), $"text"))
    val sigs = Dedup.withMinhashSignature(both, "text", numPerm = 8, shingleN = 2)
    val pairs = Dedup.lshCandidatePairs(sigs, "id", numPerm = 8, bandRows = 2)
      .withColumn("est", Dedup.estimatedJaccard($"sigs_a", $"sigs_b", 8))
    assert(pairs.filter($"est" < 0 || $"est" > 1).isEmpty)
    // planted exact copies (id, id+1000) must be found by LSH with est = 1.0
    val planted = pairs.filter($"id_b" === $"id_a" + 1000)
    assert(planted.count() >= texts.size) // dups within texts may add more
    assert(planted.filter($"est" =!= 1.0).isEmpty)
  }

  test("salted join equals plain join for arbitrary key skew") {
    val keyGen = Gen.frequency((8, Gen.const(1L)), (2, Gen.choose(1L, 20L)))
    val keys = Gen.listOfN(300, keyGen).sample.get
    val big = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = (1L to 10L).map(k => (k, s"name$k")).toDF("k", "name")
    val salted = ScaleJoins.saltedJoin(big, small, Seq("k"), factor = 5)
      .select("k", "payload", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("simhash is permutation-sensitive only through token multiset") {
    // same tokens, different order -> identical simhash (bag-of-words op)
    val df = Seq(
      (1L, "one two three four five"),
      (2L, "five four three two one")).toDF("id", "text")
    val out = df.withColumn("sh", Dedup.simhashExpr($"text"))
      .select("sh").as[Long].collect()
    assert(out(0) == out(1))
  }

  test("quality scores are non-null for empty and whitespace-only docs") {
    val df = Seq("", "   ", "\t\n", "one real doc here").toDF("text")
    val scored = df.select(
      TA.qualityScore($"text", TA.tokens($"text")).as("q"),
      TA.stopwordRatio(TA.tokens($"text")).as("sw"))
    assert(scored.filter($"q".isNull || $"sw".isNull).isEmpty)
    // junk filter semantics: empty docs must be DROPPABLE by a threshold
    assert(scored.filter($"q" < 0.3).count() == 3)
  }

  test("tokenizer splits on all whitespace, not just literal spaces") {
    val df = Seq("the cat\nthe dog\tthe end").toDF("text")
    val toks = df.select(explode(TA.tokens($"text")).as("t"))
      .as[String].collect().toSeq
    assert(toks == Seq("the", "cat", "the", "dog", "the", "end"))
  }

  test("tokens never contain empty strings for arbitrary spacing") {
    val gapped = Gen.listOfN(25, Gen.nonEmptyListOf(Gen.oneOf("a", "bb", "ccc"))
      .map(_.mkString("  "))).sample.get
    val df = gapped.map(s => Tuple1(s"  $s ")).toDF("text")
    val bad = df.select(explode(TA.tokens($"text")).as("t")).filter($"t" === "")
    assert(bad.isEmpty)
  }

  test("native text-hash kernels equal the HOF formulations on arbitrary text") {
    // random words over a small alphabet + random whitespace runs + unicode,
    // adversarial for the hand-rolled tokenizer in functions.TextHash
    val genWord = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      Gen.oneOf("tökens", "文字", "naïve", "«quoted»", "a.b,c;d", "x" * 40))
    val genWs = Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r"))
      .map(_.mkString)
    val genText = for {
      words <- Gen.listOfN(12, genWord)
      seps <- Gen.listOfN(12, genWs)
      lead <- Gen.oneOf("", " ", "\n\n")
    } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString
    val texts = Gen.listOfN(60, genText).sample.get ++ Seq("", " ", "\t\n", "one")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .localCheckpoint()
    val diffs = df
      .withColumn("sh_n", call_function("graft_shingles", $"text", lit(3)))
      .withColumn("sh_h", TA.shingles(TA.tokens($"text"), 3))
      .withColumn("sim_n", call_function("graft_simhash", $"text", lit(32)))
      .withColumn("sim_h", Dedup.simhashExpr($"text", 32))
      .withColumn("shh_n", call_function("graft_shingle_hashes", $"text", lit(2)))
      .withColumn("shh_h", transform(TA.shingles(TA.tokens($"text"), 2),
        s => graft.ops.Hashing.md5Long(s)))
      .filter(not($"sh_n" <=> $"sh_h") || not($"sim_n" <=> $"sim_h") ||
        not($"shh_n" <=> $"shh_h"))
    assert(diffs.isEmpty, diffs.select("doc_id", "text").take(5).mkString("; "))
    val mh = Dedup.withMinhashSignatureNative(df, "text", numPerm = 8, shingleN = 3)
      .select($"doc_id", $"sigs".as("a"))
      .join(Dedup.withMinhashSignature(df, "text", numPerm = 8, shingleN = 3)
        .select($"doc_id", $"sigs".as("b")), "doc_id")
      .filter(not($"a" <=> $"b"))
    assert(mh.isEmpty, mh.take(5).mkString("; "))
  }

  test("doc chunking: chunks tile every token with exact stride/overlap") {
    // random token counts; chunk rows must (a) start at 1 + idx*stride,
    // (b) cover every token index exactly once per window-start offset,
    // (c) have full window length except possibly the tail chunks
    val W = 16; val T = 12
    val ns = Gen.listOfN(50, Gen.choose(1, 200)).sample.get
    val df = ns.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(k => s"w$k").mkString(" "))
    }.toDF("doc_id", "text").localCheckpoint()
    val toks = TA.tokens($"text")
    val chunks = df.select($"doc_id", size(toks).as("n"),
        posexplode(sequence(lit(1), size(toks), lit(T))).as(Seq("idx", "start")))
      .withColumn("len", least(lit(W), $"n" - $"start" + 1))
      .as[(Long, Int, Int, Int, Int)].collect()
    val byDoc = chunks.groupBy(_._1)
    ns.zipWithIndex.foreach { case (n, i) =>
      val cs = byDoc(i.toLong).sortBy(_._3)
      assert(cs.length == math.ceil(n.toDouble / T).toInt, s"doc $i chunk count")
      cs.foreach { case (_, _, idx, start, len) =>
        assert(start == 1 + idx * T)
        assert(len == math.min(W, n - start + 1))
      }
      // tiling: union of [start, start+len) covers 1..n
      val covered = cs.flatMap { case (_, _, _, start, len) => start until (start + len) }.toSet
      assert(covered == (1 to n).toSet, s"doc $i coverage hole")
    }
  }

  test("PII redaction removes every detected span; counts match Java regex") {
    import graft.queries.PrivacyOps
    val genPii = Gen.oneOf(
      "reach me at bob.smith+x@corp.example.org now",
      "call 212-555-0187 or 646.555.0100",
      "ssn is 078-05-1120 ok",
      "server 10.22.0.19 responded",
      "no pii here at all",
      "mixed a@b.co 1.2.3.4 999-11-2222")
    val texts = Gen.listOfN(40, genPii).sample.get
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = df.select($"doc_id", $"text",
        regexp_count($"text", lit(PrivacyOps.EmailRe)).as("e"),
        regexp_count($"text", lit(PrivacyOps.PhoneRe)).as("p"),
        regexp_count($"text", lit(PrivacyOps.SsnRe)).as("s"),
        regexp_count($"text", lit(PrivacyOps.IpRe)).as("ip"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace($"text",
          PrivacyOps.EmailRe, "[EMAIL]"), PrivacyOps.SsnRe, "[SSN]"),
          PrivacyOps.PhoneRe, "[PHONE]"), PrivacyOps.IpRe, "[IP]").as("red"))
      .collect()
    out.foreach { r =>
      val (text, red) = (r.getString(1), r.getString(6))
      // counts agree with plain Java regex on the same pattern
      def jCount(re: String) = re.r.findAllMatchIn(text).length
      assert(r.getInt(2) == jCount(PrivacyOps.EmailRe), s"email count: $text")
      assert(r.getInt(3) == jCount(PrivacyOps.PhoneRe), s"phone count: $text")
      assert(r.getInt(4) == jCount(PrivacyOps.SsnRe), s"ssn count: $text")
      assert(r.getInt(5) == jCount(PrivacyOps.IpRe), s"ip count: $text")
      // nothing PII-shaped survives redaction
      Seq(PrivacyOps.EmailRe, PrivacyOps.SsnRe, PrivacyOps.PhoneRe, PrivacyOps.IpRe)
        .foreach(re => assert(re.r.findFirstIn(red).isEmpty, s"survived: $red"))
    }
  }

  test("native char entropy equals the explode formulation on arbitrary text") {
    val genText = Gen.listOfN(40, Gen.oneOf(
      "abcabcabc", "zzzzzzzzzz", "The quick brown fox", "aabbccddeeff",
      "tökens ünïcode 文字 naïve", "x", "ab", "🙂 emoji 🙂 text",
      "mixed 123 !@# whitespace\t\nhere")).sample.get
    val df = genText.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").localCheckpoint()
    val native = df.select($"doc_id",
      call_function("graft_char_entropy", $"text").as("em"))
    val exploded = df
      .select($"doc_id", length($"text").as("n"), $"text")
      .select($"doc_id", $"n", explode(sequence(lit(1), $"n")).as("i"), $"text")
      .selectExpr("doc_id", "n", "substring(text, i, 1) AS c")
      .groupBy($"doc_id", $"n", $"c").agg(count(lit(1)).as("k"))
      .withColumn("tm",
        round(-($"k" / $"n") * log2($"k" / $"n") * 1000000).cast("long"))
      .groupBy($"doc_id").agg(sum($"tm").as("em2"))
    val diffs = native.join(exploded, Seq("doc_id"))
      .filter($"em" =!= $"em2")
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))
  }

  test("unaccent strips marks, keeps non-decomposable letters, handles NFD input") {
    val cases = Seq(
      "Caf\u00e9" -> "Cafe",                 // precomposed e-acute
      "Cafe\u0301" -> "Cafe",                // decomposed e + combining acute
      "na\u00efve" -> "naive",
      "\u017c\u00f3\u0142\u0107" -> "zo\u0142c", // zolc: l-stroke has no decomposition
      "Stra\u00dfe" -> "Stra\u00dfe",       // sharp s untouched
      "\u6587\u5b57 ascii" -> "\u6587\u5b57 ascii")
    val df = cases.zipWithIndex.map { case ((in, _), i) => (i, in) }.toDF("i", "s")
    val got = df.select($"i", call_function("graft_unaccent", $"s").as("u"))
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(got == cases.map(_._2), got.mkString("|"))
  }

  test("temperature mixture: shares sum to 1 and compress the natural skew") {
    val out = graft.queries.TrainPrepOps.mixtureTemperature(
      spark, "/root/testdata/sf0.001").collect()
    val pNat = out.map(_.getDouble(3))
    val pTemp = out.map(_.getDouble(4))
    assert(math.abs(pNat.sum - 1.0) < 1e-4, s"natural sums to ${pNat.sum}")
    assert(math.abs(pTemp.sum - 1.0) < 1e-4, s"temperature sums to ${pTemp.sum}")
    // temperature sampling compresses: max share shrinks, min share grows
    assert(pTemp.max <= pNat.max + 1e-9)
    assert(pTemp.min >= pNat.min - 1e-9)
  }
}
