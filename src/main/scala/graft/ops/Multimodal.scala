package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; decode/feature-extract runs batched per partition.
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/JPEG/BMP/GIF/WBMP via `javax.imageio` — no external libraries):
  * actual pixel dimensions and grayscale quadrant-mean features. Payloads
  * ImageIO cannot read (audio, video, unknown) fall back to the
  * clearly-marked deterministic STUB, so the batch contract covers every
  * row; swapping in FFmpeg/JNI for those is a one-function change.
  *
  * Scale notes: binary payloads make rows wide — size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits executor
  * memory, keep metadata in separate (pruned) columns so metadata-only
  * queries never read the blob pages (Parquet column pruning), and
  * repartition by a content-hash before decode so hot keys spread.
  */
object Multimodal {

  /** Typed metadata contract for decoded media. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Pure-column metadata over a binary payload (no decode needed):
    * byte length, content hash, header bytes as hex.
    */
  def withBinaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)))
      .withColumn("content_md5", md5(col(binCol)))
      .withColumn("header_hex", hex(substring(col(binCol), 1, 8)))

  /** STUB decode: deterministic pseudo-dimensions from the content hash.
    * The fallback for payloads `javax.imageio` has no codec for (audio,
    * video, unknown formats — this container has no FFmpeg); the signature
    * (bytes in, typed meta out) is the stable contract either way.
    */
  def decodeStub(mediaId: Long, bytes: Array[Byte]): Row = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def b(i: Int): Int = md(i) & 0xff
    val width = 64 + (b(0) * 256 + b(1)) % 1984 // fake 64..2047 px
    val height = 64 + (b(2) * 256 + b(3)) % 1984
    val features = Array.tabulate(4)(i => (b(4 + i) / 255.0f) * 2f - 1f)
    Row(mediaId, bytes.length, md.map("%02x".format(_)).mkString,
      width, height, features)
  }

  /** REAL image decode via the JDK's bundled codecs (PNG/JPEG/BMP/GIF/WBMP):
    * actual pixel dimensions plus 4 grayscale quadrant means scaled to
    * [-1, 1] — a deterministic feature summary (integer pixel sums, no
    * float accumulation order to drift). Returns None when no installed
    * reader recognizes the bytes.
    */
  def decodeImage(mediaId: Long, bytes: Array[Byte]): Option[Row] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
    img.map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val sums = new Array[Long](4)
      val counts = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          // integer luminance (ITU-R 601 weights scaled by 1000)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          sums(q) += lum; counts(q) += 1
          x += 1
        }
        y += 1
      }
      val features = Array.tabulate(4)(q =>
        if (counts(q) == 0) 0f
        else ((sums(q).toDouble / counts(q)) / 255.0 * 2.0 - 1.0).toFloat)
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      Row(mediaId, bytes.length, md.map("%02x".format(_)).mkString, w, h, features)
    }
  }

  /** Batched decode over partitions: the real distributed shape for codec
    * work (one partition = one sequential batch, no per-row task overhead,
    * decoder state reusable across a partition). Real ImageIO decode where
    * a codec exists, [[decodeStub]] otherwise.
    */
  def decodeAll(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaMetaSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        decodeImage(id, bytes).getOrElse(decodeStub(id, bytes))
      }
    }(enc)
  }

  /** Deterministic 8-bit grayscale PNG with `pixel(x,y) = f(x,y)`, written
    * through the RASTER (never getRGB/setRGB, whose sRGB conversion is not
    * value-preserving) so sample values round-trip bit-exactly through the
    * codec — which is what lets a hash over DECODED pixels be gated
    * against an oracle that recomputes it from the closed form.
    */
  def encodeGrayPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = im.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Schema of [[avgHash]] rows. */
  val phashSchema: StructType = StructType(Seq(
    StructField("img_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("hash_hi", LongType, nullable = false),
    StructField("hash_lo", LongType, nullable = false)))

  /** 64-bit perceptual average-hash of an encoded image, integer-exact:
    * decode, partition into an 8×8 block grid (dims must be multiples of
    * 8), bit(i,j) = "block mean > global mean" compared as
    * `blockSum · 64 > totalSum` — pure integer arithmetic, so the hash is
    * reproducible by any engine that can see the pixel values. Split into
    * two 32-bit halves so no bit ever lands on a signed long's sign bit.
    */
  def avgHash(imgId: Long, bytes: Array[Byte]): Row = {
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val r = im.getRaster
    val w = im.getWidth
    val h = im.getHeight
    require(w % 8 == 0 && h % 8 == 0, s"avgHash needs multiple-of-8 dims, got ${w}x$h")
    val bw = w / 8
    val bh = h / 8
    val bs = Array.ofDim[Long](8, 8)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = r.getSample(x, y, 0).toLong
        bs(y / bh)(x / bw) += p
        total += p
        x += 1
      }
      y += 1
    }
    var hi = 0L
    var lo = 0L
    var idx = 0
    while (idx < 64) {
      if (bs(idx / 8)(idx % 8) * 64 > total) {
        if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
      }
      idx += 1
    }
    Row(imgId, w, h, hi, lo)
  }

  /** Minimal RIFF/WAVE writer for 16-bit mono PCM — real binary format
    * plumbing (RIFF header, fmt chunk, little-endian samples), no codec
    * library. The audio twin of [[encodeGrayPng]].
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a 16-bit mono PCM WAV produced by any conforming writer:
    * walks the RIFF chunk list (tolerating extra chunks before `data`),
    * validates the fmt contract, returns (sampleRate, samples).
    */
  def parseWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF file"); bb.getInt()
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (samples == null && bb.remaining() >= 8) {
      val id = tag(); val len = bb.getInt()
      id match {
        case "fmt " =>
          val fmt = bb.getShort(); val ch = bb.getShort()
          sampleRate = bb.getInt(); bb.getInt(); bb.getShort()
          val bits = bb.getShort()
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported wav: fmt=$fmt ch=$ch bits=$bits")
          bb.position(bb.position() + (len - 16))
        case "data" =>
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = bb.getShort(); i += 1 }
          samples = out
        case _ => bb.position(bb.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    (sampleRate, samples)
  }

  /** Schema of [[wavStats]] rows. */
  val audioStatsSchema: StructType = StructType(Seq(
    StructField("clip_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("amp_min", IntegerType, nullable = false),
    StructField("amp_max", IntegerType, nullable = false),
    StructField("abs_sum", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))

  /** Integer waveform statistics from an encoded WAV — every stat exact
    * (min/max amplitude, Σ|x| as the integer loudness proxy, strict
    * sign-flip zero crossings), so an oracle that knows the waveform's
    * closed form can reproduce them bit-for-bit without parsing a byte.
    */
  def wavStats(clipId: Long, bytes: Array[Byte]): Row = {
    val (sr, xs) = parseWavPcm16(bytes)
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var absSum = 0L
    var zc = 0L
    var i = 0
    while (i < xs.length) {
      val v = xs(i).toInt
      if (v < mn) mn = v
      if (v > mx) mx = v
      absSum += math.abs(v)
      if (i > 0 && v.toLong * xs(i - 1) < 0) zc += 1
      i += 1
    }
    Row(clipId, sr, xs.length, mn, mx, absSum, zc)
  }

  /** Deterministic fake frame-sampling positions for a "video" payload:
    * every `stride`-th byte offset, up to `maxFrames` — the plumbing for
    * frame extraction without a codec.
    */
  def framePositions(nBytes: Column, stride: Int, maxFrames: Int): Column =
    slice(sequence(lit(1), greatest(nBytes, lit(1)), lit(stride)), 1, maxFrames)

  /** Aspect-preserving fit-into-`target` resize dims — integer arithmetic
    * (`div` on the long edge) so the plan stays codegen'd and the result
    * hash-exact; the pixel resample itself belongs to the stubbed decode
    * kernel, this is the metadata path every image pipeline plans with.
    * Never upscales: payloads already inside the box keep their dims.
    */
  def resizeDims(w: Column, h: Column, target: Int): (Column, Column) = {
    val longEdge = greatest(w, h)
    // floor(double-div) is exact here: for ints a < 2^20, b < 2^12 a
    // non-integer a/b sits >= 2^-12 from any integer, far beyond one ulp
    def fit(c: Column): Column =
      when(longEdge <= target, c)
        .otherwise(floor(c.cast("long") * target / longEdge).cast("int"))
    (fit(w), fit(h))
  }
}
