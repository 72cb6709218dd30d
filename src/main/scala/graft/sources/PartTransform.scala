package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style partition TRANSFORMS for TableLog — hidden partitioning.
  *
  * A transform derives a coarse layout column from a source column at
  * write time (`days(ts)`, `bucket(n, id)`, `truncate(w, k)`); readers
  * never see the derived column, and queries filter on the SOURCE column
  * only. [[TableLogFileIndex]] closes the loop: it knows the transform
  * (recorded as `#layout=` manifest metadata) and translates a pushed
  * predicate on the source column into constraints on the layout
  * directory values — pruning Spark itself cannot do, because nothing in
  * the schema relates `_tp_day_ts` to `ts`.
  *
  * Why this matters at 100 TB: raw-column partitioning (`ts` truncated by
  * hand, or worse, high-cardinality raw values) couples the query
  * contract to the layout — every user must repeat the derivation in
  * every WHERE, and getting it wrong silently scans the table. Hidden
  * partitioning keeps the layout an operational concern: re-partition by
  * week instead of day and no query changes.
  *
  * Derivations are deterministic and re-computable at plan time:
  *  - `days(c)`: floor(epoch-seconds / 86400) — UTC epoch days.
  *  - `bucket(n, c)`: pmod(xxhash64(c), n) with Spark's default seed (42)
  *    — equality predicates map to exactly one bucket.
  *  - `truncate(w, c)`: long → floor-to-multiple-of-w; string → first w
  *    chars (range predicates keep order: truncate is monotone).
  */
sealed trait PartTransform {
  def source: String

  /** The hive directory column this transform writes. */
  def dirCol: String

  /** Column expression deriving the layout value at write time. */
  def derive: Column

  /** Manifest serialization (`#layout=` payload). */
  def line: String

  /** Can a file whose layout value is `dirValue` contain a row with
    * source-column bounds [lo, hi] (integral encoding: micros for
    * timestamps, days for dates, the value itself for longs)? Equality
    * literals arrive separately for hash transforms via `eq`.
    */
  def mayContain(dirValue: String, lo: Long, hi: Long): Boolean

  /** Equality pruning (hash transforms): can a file with `dirValue`
    * contain source == eqValue? Non-hash transforms fall back to
    * [[mayContain]] through the caller's bounds.
    */
  def mayContainEq(dirValue: String, eqValue: Any): Boolean = true
}

/** `days(tsCol)` — tsCol is a TimestampType column (epoch micros). */
case class DaysOf(source: String) extends PartTransform {
  val dirCol = s"_tp_day_$source"
  def derive: Column =
    floor(col(source).cast("long") / 86400L).cast("int")
  def line: String = s"$dirCol|days|$source|0"
  /** lo/hi are epoch MICROS (the literal encoding of TimestampType). */
  def mayContain(dirValue: String, lo: Long, hi: Long): Boolean = {
    val day = dirValue.toLong
    def toDay(micros: Long) = Math.floorDiv(Math.floorDiv(micros, 1000000L), 86400L)
    day >= toDay(lo) && day <= toDay(hi)
  }
}

/** `bucket(n, c)` — pmod(xxhash64(c), n), Spark's default seed. Only
  * equality predicates prune (a range says nothing about hash buckets).
  */
case class BucketOf(n: Int, source: String) extends PartTransform {
  val dirCol = s"_tp_bucket_$source"
  def derive: Column = pmod(xxhash64(col(source)), lit(n)).cast("int")
  def line: String = s"$dirCol|bucket|$source|$n"
  def mayContain(dirValue: String, lo: Long, hi: Long): Boolean =
    if (lo == hi) mayContainEq(dirValue, lo) else true
  override def mayContainEq(dirValue: String, eqValue: Any): Boolean = {
    val litr = eqValue match {
      case s: String => Literal(UTF8String.fromString(s), StringType)
      case l: Long   => Literal(l, LongType)
      case other     => Literal(other)
    }
    val h = new XxHash64(Seq(litr), 42L).eval(null).asInstanceOf[Long]
    val bucket = ((h % n) + n) % n
    dirValue.toLong == bucket
  }
}

/** `truncate(w, c)` — long floor-to-multiple; monotone, so ranges map to
  * ranges.
  */
case class TruncateOf(w: Long, source: String) extends PartTransform {
  val dirCol = s"_tp_trunc_$source"
  def derive: Column =
    (floor(col(source).cast("long") / w) * w).cast("long")
  def line: String = s"$dirCol|truncate|$source|$w"
  def mayContain(dirValue: String, lo: Long, hi: Long): Boolean = {
    val t = dirValue.toLong
    def trunc(v: Long) = Math.floorDiv(v, w) * w
    t >= trunc(lo) && t <= trunc(hi)
  }
}

object PartTransform {
  def parse(payload: String): Option[PartTransform] =
    payload.split('|') match {
      case Array(_, "days", src, _)     => Some(DaysOf(src))
      case Array(_, "bucket", src, n)   => Some(BucketOf(n.toInt, src))
      case Array(_, "truncate", src, w) => Some(TruncateOf(w.toLong, src))
      case _ => None
    }
}
