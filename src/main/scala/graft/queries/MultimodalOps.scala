package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Multimodal

/** Multimodal binary-column plumbing, oracle-checked on the SQL-expressible
  * surface (byte length, content hash, header bytes, stub-decoded
  * dimensions, frame-sample count). The `mapPartitions` batch decoder is
  * exercised in MultimodalSpec — DuckDB has no blob md5/substring, so the
  * oracle mirrors the byte math through the (verified ASCII) text column.
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  def multimodalMeta: Q = (s, d) => {
    val withBlob = Tables.documents(s, d)
      .withColumn("blob", encode(col("text"), "utf-8"))
    Multimodal.withBinaryMeta(withBlob, "blob")
      .withColumn("width",
        (lit(64) + conv(substring(col("content_md5"), 1, 4), 16, 10).cast("int") % 1984).cast("int"))
      .withColumn("height",
        (lit(64) + conv(substring(col("content_md5"), 5, 4), 16, 10).cast("int") % 1984).cast("int"))
      .withColumn("n_frames",
        size(Multimodal.framePositions(col("n_bytes"), stride = 64, maxFrames = 8)))
      .select(col("doc_id"), col("n_bytes"), col("content_md5"), col("header_hex"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  md5(text) AS content_md5,
      |  hex(encode(substring(text, 1, 8))) AS header_hex,
      |  CAST(64 + CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) % 1984 AS INTEGER) AS width,
      |  CAST(64 + CAST('0x' || substr(md5(text), 5, 4) AS INTEGER) % 1984 AS INTEGER) AS height,
      |  CAST(least(CAST(floor((octet_length(encode(text)) - 1) / 64) AS INTEGER) + 1, 8) AS INTEGER) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling: posexplode the deterministic frame positions of each
    * "video" payload (every 64th byte, ≤8 frames) and extract a per-frame
    * feature (the byte at the position — stub for a real frame decode).
    * The generator runs scan-side; fan-out is bounded by maxFrames.
    */
  def frameSample: Q = (s, d) => {
    val withBlob = Tables.documents(s, d)
      .filter(col("doc_id") % 25 === 0)
      .withColumn("blob", encode(col("text"), "utf-8"))
      .withColumn("n_bytes", length(col("blob")))
    withBlob
      .select(col("doc_id"), col("text"),
        posexplode(Multimodal.framePositions(col("n_bytes"), stride = 64, maxFrames = 8))
          .as(Seq("frame_idx", "byte_pos")))
      .withColumn("frame_byte", expr("ascii(substring(text, byte_pos, 1))"))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("byte_pos").cast("int").as("byte_pos"), col("frame_byte").cast("int").as("frame_byte"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val frameSampleSql: String =
    """SELECT doc_id,
      |  CAST((byte_pos - 1) // 64 AS INTEGER) AS frame_idx,
      |  CAST(byte_pos AS INTEGER) AS byte_pos,
      |  CAST(ascii(substring(text, byte_pos, 1)) AS INTEGER) AS frame_byte
      |FROM (
      |  SELECT doc_id, text,
      |    unnest(generate_series(1, greatest(octet_length(encode(text)), 1), 64)[1:8]) AS byte_pos
      |  FROM documents WHERE doc_id % 25 = 0)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Aspect-preserving resize planning over the stub-decoded dims: fit
    * every payload into 224x224 without upscaling, integer math end to
    * end. Rolls up the resize decisions per bucket (downscaled vs kept)
    * with exact pixel accounting.
    */
  def imageResize: Q = (s, d) => {
    val dims = multimodalMeta(s, d)
      .select(col("doc_id"), col("width"), col("height"))
    val (tw, th) = Multimodal.resizeDims(col("width"), col("height"), 224)
    dims
      .withColumn("target_w", tw).withColumn("target_h", th)
      .withColumn("action",
        when(col("target_w") === col("width") && col("target_h") === col("height"), "keep")
          .otherwise("downscale"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("width").cast("long") * col("height")).as("pixels_in"),
        sum(col("target_w").cast("long") * col("target_h")).as("pixels_out"),
        max(col("target_w")).as("max_w"), max(col("target_h")).as("max_h"))
      .orderBy(col("action"))
  }

  val imageResizeSql: String =
    """WITH dims AS (SELECT doc_id,
      |    CAST(64 + CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) % 1984 AS INTEGER) AS w,
      |    CAST(64 + CAST('0x' || substr(md5(text), 5, 4) AS INTEGER) % 1984 AS INTEGER) AS h
      |  FROM documents),
      |rs AS (SELECT doc_id, w, h,
      |    CASE WHEN greatest(w, h) <= 224 THEN w
      |         ELSE CAST(CAST(w AS BIGINT) * 224 // greatest(w, h) AS INTEGER) END AS tw,
      |    CASE WHEN greatest(w, h) <= 224 THEN h
      |         ELSE CAST(CAST(h AS BIGINT) * 224 // greatest(w, h) AS INTEGER) END AS th
      |  FROM dims)
      |SELECT CASE WHEN tw = w AND th = h THEN 'keep' ELSE 'downscale' END AS action,
      |  count(*) AS n_images,
      |  CAST(sum(CAST(w AS BIGINT) * h) AS BIGINT) AS pixels_in,
      |  CAST(sum(CAST(tw AS BIGINT) * th) AS BIGINT) AS pixels_out,
      |  CAST(max(tw) AS INTEGER) AS max_w, CAST(max(th) AS INTEGER) AS max_h
      |FROM rs GROUP BY 1 ORDER BY action""".stripMargin

  private val PhashN = 50

  /** Perceptual average-hash through a REAL codec round trip: 50
    * deterministic 16×16 grayscale PNGs are ENCODED (`ImageIO.write`),
    * DECODED back (`ImageIO.read`), and average-hashed from the decoded
    * raster — while the oracle recomputes the hash from the closed-form
    * pixel pattern `(x(id+2) + y(id+5) + xy) mod 256` without ever seeing a PNG.
    * Hash equality therefore gates the entire codec path bit-exactly
    * (8-bit gray PNG is lossless; raster samples bypass sRGB conversion),
    * not just the plumbing around it. Integer block-sum comparisons
    * (`blockSum·64 > total`) keep the hash engine-portable; two 32-bit
    * halves keep it off the sign bit.
    *
    * SCALE: codec work runs in `mapPartitions` batches (the decode
    * contract of [[Multimodal.decodeAll]]) — one partition = one
    * sequential batch, no per-row task overhead; at 100 TB the unit of
    * parallelism is the file group, and the hash is a per-item
    * projection with zero shuffles before the presentation sort.
    */
  def imagePhash: Q = (s, d) => {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.phashSchema)
    s.range(PhashN.toLong).toDF("img_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val png = Multimodal.encodeGrayPng(16, 16,
            (x, y) => ((x * (id + 2) + y * (id + 5) + x * y) % 256).toInt)
          Multimodal.avgHash(id, png)
        }
      }(enc)
      .orderBy(col("img_id"))
  }

  val imagePhashSql: String =
    s"""WITH img AS (SELECT unnest(generate_series(0, ${PhashN - 1})) AS img_id),
      |px AS (SELECT img_id, x, y, (x * (img_id + 2) + y * (img_id + 5) + x * y) % 256 AS p
      |  FROM img
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS x)
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS y)),
      |blocks AS (SELECT img_id, y // 2 AS bi, x // 2 AS bj, sum(p) AS bs
      |  FROM px GROUP BY 1, 2, 3),
      |tot AS (SELECT img_id, sum(p) AS total FROM px GROUP BY 1),
      |bits AS (SELECT b.img_id, bi * 8 + bj AS idx,
      |    CASE WHEN bs * 64 > total THEN 1 ELSE 0 END AS bit
      |  FROM blocks b JOIN tot USING (img_id))
      |SELECT CAST(img_id AS BIGINT) AS img_id,
      |  CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
      |  CAST(sum(CASE WHEN idx >= 32
      |    THEN bit * (CAST(1 AS BIGINT) << (idx - 32)) ELSE 0 END) AS BIGINT) AS hash_hi,
      |  CAST(sum(CASE WHEN idx < 32
      |    THEN bit * (CAST(1 AS BIGINT) << idx) ELSE 0 END) AS BIGINT) AS hash_lo
      |FROM bits GROUP BY img_id ORDER BY img_id""".stripMargin

  private val PhashDedupT = 6

  /** Image NEAR-DUP detection over perceptual hashes — the dedup family
    * extended to the multimodal column. Every odd image is a jittered
    * variant of the even image below it (sparse +6 brightness), hashes
    * come through the REAL codec round trip ([[imagePhash]]'s path), and
    * candidate pairs are generated by HAMMING BANDING: the 64-bit hash
    * splits into 4×16-bit bands, pairs sharing any band collide in a
    * bucket join — identical shape to the SimHash text dedup, never
    * all-pairs. Candidates are then verified with an exact popcount
    * distance ≤ 6.
    *
    * SCALE: banding bounds the join to bucket-mates (4 shuffle rows per
    * image); the all-pairs alternative is corpus-quadratic. Recall is the
    * documented banding tradeoff (pairs ≤ 6 bits apart that share no
    * clean band are missed — ~79% recall on this fixture); the oracle
    * applies the SAME banding, so the gate pins the algorithm, not an
    * idealized answer.
    */
  def imagePhashDedup: Q = (s, d) => {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.phashSchema)
    val hashes = s.range(PhashN.toLong).toDF("img_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val k = id / 2
          val png = Multimodal.encodeGrayPng(16, 16, (x, y) =>
            (((x * (k + 2) + y * (k + 5) + x * y)
              + (if (id % 2 == 1 && (x + y) % 7 == 0) 6 else 0)) % 256).toInt)
          Multimodal.avgHash(id, png)
        }
      }(enc)
      .select(col("img_id"), col("hash_hi"), col("hash_lo"))
    val banded = hashes.select(col("img_id"), col("hash_hi"), col("hash_lo"),
      posexplode(array(
        col("hash_lo").bitwiseAND(lit(65535L)),
        shiftrightunsigned(col("hash_lo"), 16).bitwiseAND(lit(65535L)),
        col("hash_hi").bitwiseAND(lit(65535L)),
        shiftrightunsigned(col("hash_hi"), 16).bitwiseAND(lit(65535L))))
        .as(Seq("band_idx", "band_val")))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("id_a"), col("b.img_id").as("id_b"),
        col("a.hash_hi").as("ha"), col("a.hash_lo").as("la"),
        col("b.hash_hi").as("hb"), col("b.hash_lo").as("lb"))
      .distinct()
    cands
      .withColumn("dist",
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("int"))
      .filter(col("dist") <= PhashDedupT)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val imagePhashDedupSql: String =
    s"""WITH img AS (SELECT unnest(generate_series(0, ${PhashN - 1})) AS img_id),
      |px AS (SELECT img_id, x, y,
      |    ((x * (img_id // 2 + 2) + y * (img_id // 2 + 5) + x * y)
      |     + CASE WHEN img_id % 2 = 1 AND (x + y) % 7 = 0 THEN 6 ELSE 0 END) % 256 AS p
      |  FROM img
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS x)
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS y)),
      |blocks AS (SELECT img_id, y // 2 AS bi, x // 2 AS bj, sum(p) AS bs
      |  FROM px GROUP BY 1, 2, 3),
      |tot AS (SELECT img_id, sum(p) AS total FROM px GROUP BY 1),
      |bits AS (SELECT b.img_id, bi * 8 + bj AS idx,
      |    CASE WHEN bs * 64 > total THEN 1 ELSE 0 END AS bit
      |  FROM blocks b JOIN tot USING (img_id)),
      |h AS (SELECT img_id,
      |  CAST(sum(CASE WHEN idx >= 32
      |    THEN bit * (CAST(1 AS BIGINT) << (idx - 32)) ELSE 0 END) AS BIGINT) AS hi,
      |  CAST(sum(CASE WHEN idx < 32
      |    THEN bit * (CAST(1 AS BIGINT) << idx) ELSE 0 END) AS BIGINT) AS lo
      |  FROM bits GROUP BY img_id)
      |SELECT a.img_id AS id_a, b.img_id AS id_b,
      |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS dist
      |FROM h a JOIN h b ON a.img_id < b.img_id
      |WHERE ((a.lo & 65535) = (b.lo & 65535)
      |    OR ((a.lo >> 16) & 65535) = ((b.lo >> 16) & 65535)
      |    OR (a.hi & 65535) = (b.hi & 65535)
      |    OR ((a.hi >> 16) & 65535) = ((b.hi >> 16) & 65535))
      |  AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= $PhashDedupT
      |ORDER BY id_a, id_b""".stripMargin

  private val AudioN = 20

  /** Audio through a REAL container round trip: 20 deterministic sawtooth
    * clips are written as RIFF/WAVE 16-bit PCM ([[Multimodal.encodeWavPcm16]]
    * — real header/chunk/little-endian plumbing, no codec library),
    * parsed back by the chunk-walking reader, and reduced to integer
    * waveform statistics — while the oracle reproduces every stat from
    * the waveform's closed form `((t(997+id) + 31·id) mod 20001) − 10⁴`
    * without seeing a byte. The audio sibling of [[imagePhash]]: equality
    * gates the writer AND parser bit-exactly (PCM is lossless).
    *
    * SCALE: identical contract to image decode — mapPartitions batches,
    * per-clip projection, zero shuffles before the presentation sort.
    */
  def audioStats: Q = (s, d) => {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.audioStatsSchema)
    s.range(AudioN.toLong).toDF("clip_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = (4000 + 100 * id).toInt
          val xs = Array.tabulate(n)(t =>
            ((((t.toLong * (997 + id)) + 31 * id) % 20001) - 10000).toShort)
          Multimodal.wavStats(id, Multimodal.encodeWavPcm16(16000, xs))
        }
      }(enc)
      .orderBy(col("clip_id"))
  }

  val audioStatsSql: String =
    s"""WITH clip AS (SELECT unnest(generate_series(0, ${AudioN - 1})) AS clip_id),
      |t AS (SELECT clip_id, unnest(generate_series(0, 4000 + 100 * clip_id - 1)) AS t
      |  FROM clip),
      |sm AS (SELECT clip_id, t,
      |    ((t * (997 + clip_id) + 31 * clip_id) % 20001) - 10000 AS v FROM t),
      |l AS (SELECT clip_id, t, v,
      |    lag(v) OVER (PARTITION BY clip_id ORDER BY t) AS pv FROM sm)
      |SELECT CAST(clip_id AS BIGINT) AS clip_id,
      |  CAST(16000 AS INTEGER) AS sample_rate,
      |  CAST(count(*) AS INTEGER) AS n_samples,
      |  CAST(min(v) AS INTEGER) AS amp_min,
      |  CAST(max(v) AS INTEGER) AS amp_max,
      |  CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
      |  CAST(sum(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS zero_crossings
      |FROM l GROUP BY clip_id ORDER BY clip_id""".stripMargin

  private val BinN = 10

  /** The multimodal INGEST path end-to-end: WAV clips written as REAL
    * FILES on disk, read back through Spark's `binaryFile` source (the
    * production way a media corpus enters the lake — one row per file
    * with path + content bytes), parsed by the RIFF reader, reduced to
    * the integer waveform stats, with the clip id recovered from the
    * FILENAME. The oracle reproduces everything from the closed-form
    * waveform — so the gate covers file write → directory listing →
    * binary read → parse → stats as one chain.
    *
    * SCALE: binaryFile is a standard FileScan — partition-parallel over
    * files, `pathGlobFilter`/partitioned layouts for pruning; the decode
    * batches per partition like [[Multimodal.decodeAll]]. One caveat at
    * 100 TB: binaryFile caps per-row content at
    * `spark.sql.sources.binaryFile.maxLength` — shard bigger media.
    */
  def binaryFileIngest: Q = (s, d) => {
    val dir = Scratch.dir("binfile_wavs")
    Scratch.wipe(dir)
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(dir))
    (0 until BinN).foreach { id =>
      val n = 2000 + 50 * id
      val xs = Array.tabulate(n)(t =>
        ((((t.toLong * (641 + id)) + 13 * id) % 16001) - 8000).toShort)
      java.nio.file.Files.write(
        java.nio.file.Path.of(dir, f"clip_$id%03d.wav"),
        Multimodal.encodeWavPcm16(8000, xs))
    }
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.audioStatsSchema)
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(dir)
      .select(col("path"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val clipId = r.getString(0)
            .replaceAll(".*clip_(\\d+)\\.wav$", "$1").toLong
          Multimodal.wavStats(clipId, r.getAs[Array[Byte]](1))
        }
      }(enc)
      .orderBy(col("clip_id"))
  }

  val binaryFileIngestSql: String =
    s"""WITH clip AS (SELECT unnest(generate_series(0, ${BinN - 1})) AS clip_id),
      |t AS (SELECT clip_id, unnest(generate_series(0, 2000 + 50 * clip_id - 1)) AS t
      |  FROM clip),
      |sm AS (SELECT clip_id, t,
      |    ((t * (641 + clip_id) + 13 * clip_id) % 16001) - 8000 AS v FROM t),
      |l AS (SELECT clip_id, t, v,
      |    lag(v) OVER (PARTITION BY clip_id ORDER BY t) AS pv FROM sm)
      |SELECT CAST(clip_id AS BIGINT) AS clip_id,
      |  CAST(8000 AS INTEGER) AS sample_rate,
      |  CAST(count(*) AS INTEGER) AS n_samples,
      |  CAST(min(v) AS INTEGER) AS amp_min,
      |  CAST(max(v) AS INTEGER) AS amp_max,
      |  CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
      |  CAST(sum(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS zero_crossings
      |FROM l GROUP BY clip_id ORDER BY clip_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_binaryfile_ingest" -> binaryFileIngest,
    "q_audio_stats" -> audioStats,
    "q_image_resize" -> imageResize,
    "q_multimodal_meta" -> multimodalMeta,
    "q_frame_sample" -> frameSample,
    "q_image_phash" -> imagePhash,
    "q_dedup_phash" -> imagePhashDedup,
  )
  val oracles: Map[String, String] = Map(
    "q_binaryfile_ingest" -> binaryFileIngestSql,
    "q_audio_stats" -> audioStatsSql,
    "q_image_resize" -> imageResizeSql,
    "q_multimodal_meta" -> multimodalMetaSql,
    "q_frame_sample" -> frameSampleSql,
    "q_image_phash" -> imagePhashSql,
    "q_dedup_phash" -> imagePhashDedupSql,
  )
}
