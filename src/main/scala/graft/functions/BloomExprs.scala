package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Shared bit arithmetic for the Bloom filter aggregate and its probe.
  *
  * k bit positions are derived from ONE 64-bit input hash by
  * Kirsch–Mitzenmacher double hashing (`h1 + i·h2`, h2 forced odd from the
  * high bits) — the standard trick that gives k independent-enough probes
  * without k hash passes over the data. Everything is integer arithmetic
  * on the already-computed join-key hash, so both build and probe ride
  * whole-stage codegen.
  */
object Bloom {

  /** Bit position of probe i for `hash` in an m-bit filter. */
  def bitIndex(hash: Long, i: Int, m: Int): Int = {
    val h2 = (hash >>> 29) | 1L // odd => cycles the full ring
    java.lang.Math.floorMod(hash + i.toLong * h2, m.toLong).toInt
  }

  def add(words: Array[Long], hash: Long, k: Int): Unit = {
    val m = words.length << 6
    var i = 0
    while (i < k) {
      val b = bitIndex(hash, i, m)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  /** True iff all k bits for `hash` are set (no false negatives ever;
    * false positives at the filter's design rate). Static so generated
    * code can call it from any WholeStageCodegen stage.
    */
  def probe(bits: ArrayData, hash: Long, k: Int): Boolean = {
    val m = bits.numElements() << 6
    var i = 0
    while (i < k) {
      val b = bitIndex(hash, i, m)
      if ((bits.getLong(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `graft_bloom(hash, m, k)` — build an m-bit Bloom filter over a group's
  * hash values, returned as `array<long>` bit words (m/64 longs).
  *
  * The 100 TB role is the semi-join reducer: build the filter over the
  * SELECTIVE side's join keys (one partial-aggregated pass — per-partition
  * filters are OR-merged, so the merge is a trivial monoid), broadcast the
  * few-KB bit array, and drop non-matching fact rows AT THE SCAN, before
  * they ever reach a shuffle. Spark's own runtime-filter injection
  * (`spark.sql.optimizer.runtime.bloomFilter`) does this opportunistically;
  * this operator makes the filter an explicit, mergeable, storable value —
  * it can live in incremental-rollup state or a table property and prune
  * TOMORROW'S scan, which a runtime filter cannot.
  *
  * Bits are set purely by hash arithmetic, so the filter is bit-identical
  * at any parallelism (determinism discipline of [[KmvAgg]]).
  */
@ExpressionDescription(
  usage = "graft_bloom(hash, m, k) - m-bit bloom filter over the group's hashes as array<long>")
case class BloomAgg(
    hashExpr: Expression,
    mExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private def litInt(e: Expression, name: String): Int = {
    require(e.foldable, s"graft_bloom $name must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private lazy val m: Int = {
    val v = litInt(mExpr, "m")
    require(v > 0 && v % 64 == 0, s"graft_bloom m must be a positive multiple of 64, got $v")
    v
  }
  private lazy val k: Int = {
    val v = litInt(kExpr, "k")
    require(v > 0, s"graft_bloom k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(hashExpr, mExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType == LongType && mExpr.dataType == IntegerType &&
        kExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, int, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) Bloom.add(buf, h.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(hashExpr = newChildren(0), mExpr = newChildren(1), kExpr = newChildren(2))
}

/** `graft_bloom_probe(bits, hash, k)` → boolean: membership test against a
  * [[BloomAgg]] bit array (m is implied by the array length). Codegen'd, so
  * the probe fuses into the scan's WholeStageCodegen stage — the fact
  * table's non-matching rows die in the same generated loop that read
  * them.
  */
case class BloomProbe(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(bits: Any, hash: Any): Any =
    Bloom.probe(bits.asInstanceOf[ArrayData], hash.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, hash) =>
      s"${ev.value} = graft.functions.Bloom.probe($bits, $hash, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}
