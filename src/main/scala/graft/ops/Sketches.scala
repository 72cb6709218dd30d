package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level companions to the [[graft.functions.KmvAgg]] sketch: the
  * estimate derivation and the state-merge used by incremental rollups.
  * Both are plain (codegen'd) array expressions over k-element arrays, and
  * both have exact DuckDB equivalents so sketch outputs stay hash-gateable.
  */
object Sketches {

  /** 2^60 — the value space of [[Hashing.md5Long]]; exactly representable
    * as a double (mantissa 1, exponent 60), so `(k-1) * KmvSpace` is an
    * exact double product in Spark and DuckDB alike.
    */
  val KmvSpace: Double = 1.152921504606846976e18

  /** The KMV aggregate as a Column (requires graft function registration). */
  def kmv(hash: Column, k: Int): Column = call_function("graft_kmv", hash, lit(k))

  /** Distinct-count estimate from a k-min set: exact when the set never
    * filled (|set| IS the distinct count), else the classic KMV estimator
    * `(k-1) * space / kthSmallest`, floored for engine-portable rounding.
    */
  def kmvEstimate(set: Column, k: Int): Column =
    when(size(set) < k, size(set).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(KmvSpace) /
        element_at(set, k).cast("double")).cast("long"))

  /** Merge partial k-min sets ACROSS ROWS of a group (rollup state merge):
    * distinct-union of all sets, sorted, truncated to k. collect_list order
    * is nondeterministic but distinct+sort makes the merge order-free —
    * the monoid property incremental state needs.
    */
  def kmvMergeAgg(set: Column, k: Int): Column =
    slice(array_sort(array_distinct(flatten(collect_list(set)))), 1, k)

  /** DuckDB fragment for [[kmvEstimate]] given the per-group distinct
    * count `ndExpr` and k-th smallest hash `hkExpr` (NULL when unfilled).
    */
  def kmvEstimateSql(ndExpr: String, hkExpr: String, k: Int): String =
    s"CAST(CASE WHEN $ndExpr < $k THEN $ndExpr ELSE " +
      s"CAST(floor(${(k - 1).toDouble} * 1152921504606846976.0 / " +
      s"CAST($hkExpr AS DOUBLE)) AS BIGINT) END AS BIGINT)"

  // ------------------------------------------------------------ count-min

  /** The count-min aggregate as a Column (see [[graft.functions.CmsAgg]]);
    * the aggregate masks the hash to 30 bits itself, so raw
    * [[Hashing.md5Long]] input is safe (identical result to pre-masked).
    */
  def cms(hash: Column, depth: Int, width: Int): Column =
    call_function("graft_cms", hash, lit(depth), lit(width))

  /** CMS row-d cell index — masks to 30 bits first (same arithmetic as the
    * aggregate's update path; unmasked input would overflow into a
    * negative index).
    */
  def cmsCell(hash: Column, d: Int, width: Int): Column =
    ((hash.bitwiseAND(lit(Dedup.HashMask)) * lit(Dedup.permA(d)) +
      lit(Dedup.permB(d))) % lit(Dedup.PermMod)) % width

  /** Point-frequency estimate from the counter matrix: min over rows of
    * the probed cell (upper-bounds the true count; never under).
    */
  def cmsEstimate(sketch: Column, hash: Column, depth: Int, width: Int): Column =
    (0 until depth).map(d =>
      element_at(sketch, (lit(d * width) + cmsCell(hash, d, width) + 1).cast("int")))
      .reduce(least(_, _))

  /** DuckDB fragment for row-d cell of `hashExpr` (masked). */
  def cmsCellSql(hashExpr: String, d: Int, width: Int): String =
    s"((($hashExpr) * ${Dedup.permA(d)} + ${Dedup.permB(d)}) % ${Dedup.PermMod}) % $width"
}
