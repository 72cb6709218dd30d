package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic numeric aggregation policy.
  *
  * Double sums are order-dependent (Spark merges partial aggregates in task
  * completion order), so a raw `sum(double)` can't hash-match an external
  * oracle — and at 1000-executor scale the nondeterminism only grows. Money
  * columns are therefore scaled to integer cents per row (exact, associative,
  * commutative → order-independent sums); averages are expressed as
  * exact-sum / count. The same policy keeps results bit-stable across
  * cluster sizes, which matters for regression-testing 100 TB runs.
  */
object Num {

  /** Per-row money value -> exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-independent exact money sum, surfaced as a double in dollars. */
  def moneySum(c: Column): Column = (sum(cents(c)).cast("double") / 100.0)

  /** SQL (DuckDB) equivalent of [[moneySum]] for the oracle side. */
  def moneySumSql(expr: String): String =
    s"CAST(sum(CAST(round(($expr) * 100) AS BIGINT)) AS DOUBLE) / 100.0"

  /** Half-up rounding as pure arithmetic — `floor(x·10ᵈ + 0.5)/10ᵈ` —
    * emitted with the SAME expression on both engines. The `round()`
    * builtins disagree at exact .5 boundaries (Spark rounds the double's
    * shortest decimal string via BigDecimal; DuckDB rounds the IEEE
    * value), and RATIONAL-valued outputs (percentages, rates, exact
    * averages) land on those boundaries with real probability — two docs
    * in 5000 flipped q_text_stats' last digit at sf0.1. For negative
    * inputs this is round-half-toward-+infinity rather than half-away —
    * still cross-engine consistent (both sides emit the same arithmetic),
    * just a different tie direction than `round()` would give.
    */
  def roundAt(digits: Int)(c: Column): Column = {
    val f = math.pow(10, digits)
    floor(c * f + 0.5) / f
  }

  def roundAtSql(digits: Int, e: String): String = {
    val f = math.pow(10, digits).toLong
    s"floor(($e) * $f + 0.5) / $f"
  }

  /** Order-independent exact sum of a fractional metric in integer
    * MICRO-units, surfaced back as a double — the 6-decimal sibling of
    * [[moneySum]] (event values, scores). One canonical copy: EventOps,
    * BehaviorOps, and WindowArrayOps all aggregate through this.
    */
  def microSum(c: Column): Column =
    sum(round(c * 1000000).cast("long")).cast("double") / 1000000.0

  def microSumSql(e: String): String =
    s"CAST(sum(CAST(round(($e) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0"
}
