package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_cms(hash, depth, width)` — a count-min sketch (Cormode &
  * Muthukrishnan 2005) as a mergeable aggregate: `depth × width` counters,
  * row d incrementing cell `((a_d*h + b_d) mod (2^31-1)) mod width` per
  * input row. Returns the counter matrix row-major as array<long>;
  * `graft.ops.Sketches.cmsEstimate` reads min-over-rows for any key.
  *
  * The frequency-sketch sibling of [[KmvAgg]] (distinct-count): fixed
  * `depth*width` longs of state per group regardless of key cardinality,
  * cell-wise-ADDITIVE merge (order-free linear sketch), so it serves the
  * same two masters — map-side partial aggregation with bounded shuffle
  * bytes, and incremental rollup state that never rescans history. With
  * the deterministic md5 hash the whole counter matrix is reproducible in
  * DuckDB, so estimates are hash-gateable like any exact operator.
  *
  * Permutation constants are [[graft.ops.Dedup.permA]]/`permB`; the hash
  * is masked to 30 bits ([[graft.ops.Dedup.HashMask]]) inside the update
  * so products stay under 2^61 in both engines — a no-op for callers that
  * already masked (the oracle contract), and a guard against the raw
  * 60-bit hashes [[KmvAgg]] accepts, whose products overflow Long into a
  * negative cell index (AIOOBE) without it.
  */
@ExpressionDescription(
  usage = "graft_cms(hash, depth, width) - count-min sketch counters, row-major")
case class CmsAgg(
    hashExpr: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import graft.ops.Dedup

  private def litInt(e: Expression, name: String): Int = {
    require(e.foldable, s"graft_cms $name must be a literal")
    val v = e.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"graft_cms $name must be positive, got $v")
    v
  }
  private lazy val depth: Int = litInt(depthExpr, "depth")
  private lazy val width: Int = litInt(widthExpr, "width")
  @transient private lazy val pa: Array[Long] = (0 until depth).map(Dedup.permA).toArray
  @transient private lazy val pb: Array[Long] = (0 until depth).map(Dedup.permB).toArray

  override def children: Seq[Expression] = Seq(hashExpr, depthExpr, widthExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType == LongType && depthExpr.dataType == IntegerType &&
      widthExpr.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, int, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long] & Dedup.HashMask
      var d = 0
      while (d < depth) {
        val cell = (((pa(d) * hv + pb(d)) % Dedup.PermMod) % width).toInt
        buf(d * width + cell) += 1
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(hashExpr = newChildren(0), depthExpr = newChildren(1),
      widthExpr = newChildren(2))
}
