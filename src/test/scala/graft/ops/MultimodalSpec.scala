package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "fake-image-bytes-aaaaaaaa"),
    (2L, "fake-audio-bytes-bbbbbbbb"),
  ).toDF("media_id", "payload")
    .withColumn("blob", encode($"payload", "utf-8"))

  test("withBinaryMeta: byte length, content hash, header hex") {
    val out = Multimodal.withBinaryMeta(media, "blob")
      .select("media_id", "n_bytes", "content_md5", "header_hex")
      .as[(Long, Int, String, String)].collect().sortBy(_._1)
    assert(out(0)._2 == 25)
    assert(out(0)._3.length == 32)
    assert(out(0)._4 == "66616B652D696D61") // "fake-ima" in hex
  }

  test("decodeAll: batched stub decode yields typed metadata + features") {
    val out = Multimodal.decodeAll(media, "media_id", "blob").cache()
    assert(out.schema == Multimodal.mediaMetaSchema)
    val rows = out.collect().sortBy(_.getLong(0))
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getInt(1) == 25)
    assert(r.getInt(3) >= 64 && r.getInt(3) < 2048) // width in fake range
    assert(r.getSeq[Float](5).length == 4)
    assert(r.getSeq[Float](5).forall(f => f >= -1f && f <= 1f))
    // determinism: same bytes -> same decode
    val again = Multimodal.decodeAll(media, "media_id", "blob").collect().sortBy(_.getLong(0))
    assert(again.head == r)
  }

  test("framePositions: stride sampling capped at maxFrames") {
    val out = media.select(
        size(Multimodal.framePositions(lit(200), 64, 8)).as("n"))
      .as[Int].head()
    assert(out == 4) // offsets 1,65,129,193
  }
}
