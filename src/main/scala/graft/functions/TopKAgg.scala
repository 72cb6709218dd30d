package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** `graft_topk(value, payload, k)` — per-group top-k as a bounded-heap
  * aggregate: returns `array<struct<value double, payload bigint>>` sorted
  * by (value desc, payload asc).
  *
  * Why an aggregate and not `row_number() OVER (...) <= k`: the window form
  * shuffles EVERY row to its key partition and sorts the whole partition;
  * this aggregate keeps a k-element heap per group, combines partial heaps
  * map-side before the shuffle (standard partial aggregation), so only
  * k rows per group per mapper cross the wire — at 100 TB with hot keys the
  * difference is the whole job. Same plan family as Spark's own
  * `TakeOrderedAndProject`, generalized to per-group.
  *
  * Determinism: ties on value resolve to the smallest payload, so results
  * are stable under any partitioning/merge order.
  */
@ExpressionDescription(
  usage = "graft_topk(value, payload, k) - top-k (value,payload) pairs per group, value desc")
case class TopKAgg(
    valueExpr: Expression,
    payloadExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // dequeue yields the WORST retained pair: lowest value, then largest payload
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_topk k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"graft_topk k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(valueExpr, payloadExpr, kExpr)

  // (AbstractDataType is private[sql], so explicit check instead of
  // ImplicitCastInputTypes; callers cast value/payload as needed)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = valueExpr.dataType == DoubleType &&
      payloadExpr.dataType == LongType && kExpr.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType), StructField("payload", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    pair: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (worstFirst.compare(pair, buf.head) < 0) { // pair beats the worst
      buf.dequeue(); buf.enqueue(pair)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (v != null && p != null)
      offer(buf, (v.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)])
  : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, p) => out.writeDouble(v); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(valueExpr = newChildren(0), payloadExpr = newChildren(1),
      kExpr = newChildren(2))
}
