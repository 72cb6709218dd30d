package graft.faers

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Port of the reference's transform unit tests
  * (tests/unit/test_silver_transformations.py) — same golden cases.
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("date repair: 8/6/4-digit and invalid (test_silver_transformations.py:26-47)") {
    val df = Seq("20240315", "202403", "2024", "garbage", "99999999")
      .toDF("dt")
    val out = Transforms.repairFaersDate(df, "dt", "fixed")
      .select($"dt", $"fixed".cast("string")).as[(String, Option[String])]
      .collect().toMap
    assert(out("20240315") == Some("2024-03-15"))
    assert(out("202403") == Some("2024-03-01"))
    assert(out("2024") == Some("2024-01-01"))
    assert(out("garbage").isEmpty)
    assert(out("99999999").isEmpty) // 9999-99-99 is not a date
  }

  test("numeric coercion rejects negatives/exponents (:50-66)") {
    val df = Seq("42", "3.14", "-5", "1e3", "abc", "10.")
      .toDF("wt")
    val out = Transforms.standardizeNumericFields(df.withColumn("orig", $"wt"), Seq("wt"))
      .select($"orig", $"wt").as[(String, Option[Double])].collect().toMap
    assert(out("42") == Some(42.0))
    assert(out("3.14") == Some(3.14))
    assert(out("10.") == Some(10.0))
    assert(out("-5").isEmpty)
    assert(out("1e3").isEmpty)
    assert(out("abc").isEmpty)
  }

  test("numericShape == anchored regex over the full shape space (r12 rlike removal)") {
    // exhaustive over the alphabet that decides the predicate: digits, dot,
    // sign, letter, space, unicode digit — every string up to length 4 plus
    // targeted longer shapes. Oracle semantics = RE2 end-of-text anchoring,
    // which for newline-free input equals Java's; trailing-terminator
    // strings are asserted separately against the DOCUMENTED divergence.
    val alphabet = Seq("0", "9", "5", ".", "-", "+", "a", " ", "١") // ١ = arabic-indic digit
    val upTo3 = for {
      a <- "" +: alphabet; b <- "" +: alphabet; c <- "" +: alphabet
    } yield a + b + c
    val longer = Seq("12345", "123.45", "1.2.3", "12.", ".12", "00007",
      "1234567890123456789", "9.0000000001", "١٢٣", "12 3", "12\t")
    val cases = (upTo3 ++ longer).distinct.filter(_.nonEmpty)
    val re = "^[0-9]+\\.?[0-9]*$".r.pattern
    val df = cases.toDF("s")
      .select($"s", Transforms.numericShape($"s").as("got"))
    val out = df.as[(String, Option[Boolean])].collect().toMap
    cases.foreach { s =>
      val want = re.matcher(s).matches()
      assert(out(s).contains(want), s"'$s': builtin=${out(s)} regex=$want")
    }
    // the documented divergence: Java's un-flagged $ matches before ONE
    // trailing line terminator; RE2 (the DuckDB oracle) and the builtin
    // both anchor at end-of-text and reject
    val nl = Seq("12\n", "1.5\n", "12\r\n").toDF("s")
      .select(Transforms.numericShape($"s")).as[Option[Boolean]].collect()
    assert(nl.forall(_.contains(false)))
    // null stays null (when(null,...) -> otherwise branch -> null result,
    // same as rlike's null propagation through the when)
    val nulled = Transforms.standardizeNumericFields(
      Seq[Option[String]](None).toDF("wt"), Seq("wt"))
      .select($"wt").as[Option[Double]].collect()
    assert(nulled.head.isEmpty)
  }

  test("age groups incl. null -> Unknown (:69-88)") {
    val df = Seq(Some(5.0), Some(18.0), Some(64.0), Some(65.0), None)
      .toDF("age")
    val out = Transforms.calculateAgeGroups(df)
      .select($"age", $"age_group").as[(Option[Double], String)].collect().toMap
    assert(out(Some(5.0)) == "Pediatric (0-17)")
    assert(out(Some(18.0)) == "Adult (18-64)")
    assert(out(Some(64.0)) == "Adult (18-64)")
    assert(out(Some(65.0)) == "Elderly (65+)")
    assert(out(None) == "Unknown")
  }

  test("drug-name cleanup strips punctuation, trims, uppercases (:91-120)") {
    val df = Seq("  aspirin!! ", "Tylenol (500mg)", "ibu-profen")
      .toDF("drugname")
    val out = Transforms.standardizeDrugNames(df.withColumn("orig", $"drugname"))
      .select($"orig", $"drugname").as[(String, String)].collect().toMap
    assert(out("  aspirin!! ") == "ASPIRIN")
    assert(out("Tylenol (500mg)") == "TYLENOL 500MG")
    assert(out("ibu-profen") == "IBUPROFEN")
  }

  test("dosage parse into (dose, unit, frequency) (:123-152)") {
    val df = Seq("500 mg, twice daily", "10MG", "unknown")
      .toDF("dose_vbm")
    val out = Transforms.parseDosageInformation(df)
      .select($"dose_vbm", $"dose", $"dose_unit", $"dose_frequency")
      .as[(String, Option[Double], String, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out("500 mg, twice daily") == ((Some(500.0), "MG", "TWICE DAILY")))
    assert(out("10MG") == ((Some(10.0), "MG", "")))
    assert(out("unknown") == ((None, "", "")))
  }

  test("ingestion metadata adds _ingest_ts and _source_file (test_utils.py:18-26)") {
    val df = Seq(1, 2).toDF("x")
    val out = Transforms.addIngestionMetadata(df)
    assert(out.columns.contains("_ingest_ts"))
    assert(out.columns.contains("_source_file"))
    assert(out.filter($"_ingest_ts".isNull).count() == 0)
  }
}
