package graft.sources

import org.apache.spark.sql.catalyst.expressions.{In, Literal}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the runtime-filter translation ([[GraftRuntimePrune]])
  * — the exact-or-dropped contract, channel routing, and column-mapping
  * awareness that GraftDppSpec exercises end-to-end.
  */
class GraftRuntimePruneSpec extends AnyFunSuite {

  private def ctx(
      l2p: Map[String, String] = Map.empty,
      transformSources: Seq[String] = Seq.empty) = GraftRuntimePruneCtx(
    index = null, // translate/filterAttributes never touch the index
    partSchema = StructType(Seq(StructField("day_key", IntegerType),
      StructField("_tp_bucket_uid", IntegerType))),
    visiblePartPhys = Seq("day_key"),
    transformSourcesPhys = transformSources,
    l2p = l2p,
    physDataSchema = StructType(Seq(StructField("uid", LongType),
      StructField("name", StringType))))

  test("In on a visible partition column -> partition-channel catalyst In") {
    val (part, data) = GraftRuntimePrune.translate(ctx(),
      Array(sources.In("day_key", Array(1, 2))))
    assert(data.isEmpty)
    assert(part.size == 1)
    val In(attr, vals) = part.head
    assert(attr.references.head.name == "day_key")
    assert(vals == Seq(Literal(1), Literal(2)))
  }

  test("In on a hidden-transform source -> data channel, typed from the data schema") {
    val (part, data) = GraftRuntimePrune.translate(
      ctx(transformSources = Seq("uid")),
      Array(sources.In("uid", Array(5L, 10L))))
    assert(part.isEmpty)
    assert(data.size == 1)
    val In(attr, vals) = data.head
    assert(attr.references.head.name == "uid" && attr.dataType == LongType)
    assert(vals == Seq(Literal(5L), Literal(10L)))
  }

  test("empty build side prunes everything (FalseLiteral, not an invalid empty In)") {
    val (part, data) = GraftRuntimePrune.translate(ctx(),
      Array(sources.In("day_key", Array.empty[Any])))
    assert(data.isEmpty)
    assert(part == Seq(Literal.FalseLiteral))
  }

  test("logical->physical rename maps both directions") {
    val renamed = ctx(l2p = Map("event_day" -> "day_key"))
    // filterAttributes reports the LOGICAL name
    assert(GraftRuntimePrune.filterAttributes(renamed)
      .map(_.fieldNames().mkString(".")).toSeq == Seq("event_day"))
    // a filter arriving under the logical name prunes the PHYSICAL column
    val (part, _) = GraftRuntimePrune.translate(renamed,
      Array(sources.EqualTo("event_day", 3)))
    assert(part.size == 1 && part.head.references.head.name == "day_key")
  }

  test("foreign columns and untranslatable shapes prune nothing") {
    val (part, data) = GraftRuntimePrune.translate(ctx(),
      Array(
        sources.In("name", Array("x")), // not a partition/transform col
        sources.GreaterThan("day_key", 5), // shape DPP never emits
        sources.IsNotNull("day_key")))
    assert(part.isEmpty && data.isEmpty)
  }

  test("null values ride along without widening the kept set") {
    val (part, data) = GraftRuntimePrune.translate(ctx(),
      Array(sources.In("day_key", Array(1, null))))
    assert(data.isEmpty && part.size == 1)
    val In(_, vals) = part.head
    // null literal evaluates to null -> row not kept by it; the non-null
    // value still keeps its partition (conservative on the keep side
    // because dir values are never null in this layout)
    assert(vals.contains(Literal(1)))
  }
}
