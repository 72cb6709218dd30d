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

  test("decodeAll decodes a real PNG: true dimensions + quadrant features") {
    // 8x4 PNG: left half black, right half white -> quadrant luminance
    // means are exactly {-1, +1, -1, +1} after [-1,1] scaling
    val im = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      im.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val png = bos.toByteArray

    val df = Seq((42L, png)).toDF("media_id", "blob")
    val r = Multimodal.decodeAll(df, "media_id", "blob").collect().head
    assert(r.getInt(3) == 8 && r.getInt(4) == 4, s"dims ${r.getInt(3)}x${r.getInt(4)}")
    assert(r.getInt(1) == png.length)
    val f = r.getSeq[Float](5)
    assert(f(0) == -1f && f(1) == 1f && f(2) == -1f && f(3) == 1f, f)

    // non-image bytes fall back to the stub, same schema
    val mixed = media.select($"media_id", $"blob")
      .unionByName(df)
    val rows = Multimodal.decodeAll(mixed, "media_id", "blob").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getSeq[Float](5).length == 4))
  }

  test("framePositions: stride sampling capped at maxFrames") {
    val out = media.select(
        size(Multimodal.framePositions(lit(200), 64, 8)).as("n"))
      .as[Int].head()
    assert(out == 4) // offsets 1,65,129,193
  }

  test("average hash is perceptual: near-dup images land within a few bits") {
    def hash(f: (Int, Int) => Int): (Long, Long) = {
      val r = Multimodal.avgHash(0L, Multimodal.encodeGrayPng(16, 16, f))
      (r.getLong(3), r.getLong(4))
    }
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val base = hash((x, y) => (x * 9 + y * 13 + x * y) % 256)
    // near-dup: small brightness jitter on a sparse pixel subset
    val jitter = hash((x, y) =>
      ((x * 9 + y * 13 + x * y) % 256 + (if ((x + y) % 7 == 0) 6 else 0)) % 256)
    // different content entirely
    val other = hash((x, y) => (255 - x * 16) % 256)
    assert(hamming(base, jitter) <= 6, s"near-dup drifted ${hamming(base, jitter)} bits")
    assert(hamming(base, other) >= 16, s"distinct images too close: ${hamming(base, other)}")
  }

  test("wav pcm16 round trip is bit-exact and the parser skips foreign chunks") {
    val xs = Array.tabulate(1000)(t => ((t * 37) % 8001 - 4000).toShort)
    val bytes = Multimodal.encodeWavPcm16(22050, xs)
    val (sr, back) = Multimodal.parseWavPcm16(bytes)
    assert(sr == 22050 && back.toSeq == xs.toSeq)
    // splice a LIST chunk between fmt and data - conforming writers may;
    // the chunk walker must skip it
    val bb = java.nio.ByteBuffer.allocate(bytes.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(bytes, 0, 36) // RIFF..WAVE..fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    bb.put(bytes, 36, bytes.length - 36)
    val spliced = bb.array()
    // fix the RIFF size field
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val (sr2, back2) = Multimodal.parseWavPcm16(spliced)
    assert(sr2 == 22050 && back2.toSeq == xs.toSeq)
  }
}
