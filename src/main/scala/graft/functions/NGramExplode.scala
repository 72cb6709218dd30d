package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{
  IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_ngram_explode(text, n)` → rows of (pos INT, shingle STRING) —
  * a custom Catalyst GENERATOR (the table-function extension point;
  * SURVEY §2.10 path (b) for row-multiplying semantics).
  *
  * Why a Generator and not `explode(graft_shingles(text, n))`: the
  * composed form MATERIALIZES the full shingle array per document before
  * the explode — for an L-token document that is L strings of n tokens
  * each (~n× the document's bytes) held at once, multiplied by the
  * per-partition batch. The generator emits lazily: one shingle exists
  * at a time, `GenerateExec` streams them straight into the downstream
  * consumer (usually a hash-aggregate's map-side combine), and peak
  * memory per row drops from O(L·n) to O(n) tokens. Same tokenizer,
  * same max(L−n+1, 1) shingle convention as [[Shingles]], plus the
  * 0-based position — which the array form would need an extra
  * `posexplode` to carry.
  */
case class NGramExplode(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def prettyName: String = "graft_ngram_explode"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val toks = TextHash.tokenize(t.asInstanceOf[UTF8String])
      val m = TextHash.shingleCount(toks, n)
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < m
        override def next(): InternalRow = {
          // fresh row per element: GenerateExec hands rows onward without
          // copying; the shingle string itself is built only now (lazy)
          val row = new GenericInternalRow(2)
          row.update(0, i)
          row.update(1, UTF8String.fromString(TextHash.shingleAt(toks, i, n)))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramExplode =
    copy(child = newChild)
}
