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
}
