package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_kmv(hash, k)` — the k-minimum-values distinct-count sketch
  * (Bar-Yossef et al. 2002) as a mergeable aggregate: keeps the k smallest
  * DISTINCT hash values per group and returns them as a sorted array<long>.
  *
  * Why this shape at 100 TB:
  *  - Exact distinct-count shuffles every distinct key (Spark's Expand
  *    rewrite); this sketch crosses the shuffle with ≤ k longs per group
  *    per mapper, map-side combined like any partial aggregate.
  *  - The k-min SET (not the estimate) is the aggregate's output, so the
  *    sketch is a mergeable partial: persisted rollup state unions sets
  *    (`Sketches.kmvMergeAgg` — plain array ops) and estimates at read
  *    time, the same monoid pattern as count/sum in
  *    [[graft.core.IncrementalRollup]].
  *  - With the deterministic 60-bit md5 hash ([[graft.ops.Hashing.md5Long]])
  *    the sketch — and therefore the estimate — is bit-identical at any
  *    parallelism AND reproducible by the DuckDB oracle (min-k via
  *    row_number), which is what lets an approximate operator be
  *    hash-gated for correctness.
  *
  * Estimate derivation lives in [[graft.ops.Sketches.kmvEstimate]]:
  * `|set| < k` → exact `|set|`; else `floor((k-1) * 2^60 / set[k])`.
  */
@ExpressionDescription(
  usage = "graft_kmv(hash, k) - k smallest distinct hash values per group, sorted")
case class KmvAgg(
    hashExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_kmv k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"graft_kmv k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(hashExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType == LongType && kExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) buf.remove(buf.last())
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = hashExpr.eval(input)
    if (h != null) offer(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
  : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(hashExpr = newChildren(0), kExpr = newChildren(1))
}
