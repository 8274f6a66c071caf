package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` content
  * plus typed metadata, with decode / feature-extract / frame-sample
  * as batch operations.
  *
  * Two decode paths:
  *  - [[decodeFeatures]] — deterministic byte-level feature hash, a
  *    codegen'd narrow projection. Used where the PLAN SHAPE is under
  *    test and for payloads that are not real media (the synthetic
  *    corpus), and as the total-function fallback below.
  *  - [[decodeMediaFeatures]] — a REAL decoder behind the
  *    mapPartitions interface, built only on JDK codecs (ImageIO:
  *    PNG/JPEG/BMP/GIF; javax.sound.sampled: WAV PCM). Images
  *    mean-pool luminance over a √dim×√dim grid; audio mean-pools
  *    |amplitude| into dim time buckets; video and undecodable bytes
  *    fall back to the hash features so the operator is total. A
  *    production build swaps in heavier codecs at the same seam —
  *    the schema, partition shape, and per-partition decoder reuse
  *    are exactly what a libjpeg/ffmpeg build would use.
  */
object Media {

  final case class MediaRow(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      content: Array[Byte],    // opaque encoded payload
      width: Int, height: Int, // image/video metadata
      sample_rate: Int,        // audio metadata
      duration_ms: Int)

  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  /** Build a deterministic media table from the documents corpus
    * (payload = text bytes; metadata derived from doc attributes). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      (pmod(col("doc_id"), lit(4)) * 320 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(3)) * 240 + 240).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 44100).otherwise(0).cast("int").as("sample_rate"),
      (length(col("text")) * 10).cast("int").as("duration_ms"))

  /** STUB decode → feature vector: `dim` floats per row derived from
    * content bytes (xxhash64 of (content, lane) scaled into [-1, 1]).
    * Runs as one codegen'd narrow projection — at scale this is where
    * a vectorized decoder UDF batch would sit, same plan shape.
    */
  def decodeFeatures(media: DataFrame, dim: Int = 16): DataFrame =
    media.withColumn("features",
      expr(s"""transform(sequence(0, ${dim - 1}),
               i -> CAST(CAST(pmod(xxhash64(content, i), 65536) AS DOUBLE) / 32768.0 - 1.0 AS FLOAT))"""))

  /** Deterministic fallback features for bytes no JDK codec accepts —
    * the same [-1, 1] scaling as [[decodeFeatures]], computed JVM-side
    * (64-bit FNV-1a per lane; the exact hash differs from the
    * codegen'd xxhash64 path on purpose: the two operators are
    * distinct surfaces, not one oracle). */
  private def fallbackFeatures(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var lane = 0
    while (lane < dim) {
      var h = 0xcbf29ce484222325L ^ lane.toLong
      var i = 0
      while (i < content.length) {
        h ^= content(i) & 0xffL; h *= 0x100000001b3L; i += 1
      }
      out(lane) = (((h % 65536 + 65536) % 65536).toDouble / 32768.0 - 1.0).toFloat
      lane += 1
    }
    out
  }

  /** Grayscale mean-pool over a grid×grid cell partition of the
    * image, scaled to [-1, 1] (grid = ⌈√dim⌉; trailing lanes 0). */
  private def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val grid = math.ceil(math.sqrt(dim.toDouble)).toInt
    val out = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var c = 0
    while (c < math.min(dim, grid * grid)) {
      val (gx, gy) = (c % grid, c / grid)
      val (x0, x1) = (gx * w / grid, math.max((gx + 1) * w / grid, gx * w / grid + 1))
      val (y0, y1) = (gy * h / grid, math.max((gy + 1) * h / grid, gy * h / grid + 1))
      var sum = 0.0; var n = 0
      var y = y0
      while (y < math.min(y1, h)) {
        var x = x0
        while (x < math.min(x1, w)) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000.0
          n += 1; x += 1
        }
        y += 1
      }
      out(c) = if (n == 0) 0f else (sum / n / 127.5 - 1.0).toFloat
      c += 1
    }
    out
  }

  /** Mean |amplitude| of PCM samples in `dim` equal time buckets,
    * scaled to [-1, 1] (silence → -1, full-scale → 1). */
  private def audioFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val big = fmt.isBigEndian
          val n = data.length / 2
          if (n == 0) None
          else {
            val out = new Array[Float](dim)
            val cnt = new Array[Int](dim)
            var i = 0
            while (i < n) {
              val (b0, b1) = (data(2 * i) & 0xff, data(2 * i + 1) & 0xff)
              val s = (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
              val bucket = math.min((i.toLong * dim / n).toInt, dim - 1)
              out(bucket) += math.abs(s.toInt).toFloat
              cnt(bucket) += 1
              i += 1
            }
            var b = 0
            while (b < dim) {
              out(b) = if (cnt(b) == 0) -1f
                else (out(b) / cnt(b) / 16384.0 - 1.0).toFloat
              b += 1
            }
            Some(out)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** REAL decode → feature vector via the JDK codecs, as a
    * mapPartitions batch (per-partition decoder state, rows streamed,
    * nothing driver-side — the shape a libjpeg/ffmpeg decoder batch
    * would use at 100 TB). Undecodable payloads fall back to the
    * deterministic byte features, so the operator is total. */
  def decodeMediaFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    val ds = media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, kind, content) =>
        val decoded: Option[Array[Float]] = kind match {
          case "image" =>
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(content)))
              .map(imageFeatures(_, dim))
            catch { case _: Exception => None }
          case "audio" => audioFeatures(content, dim)
          case _ => None
        }
        (id, kind, decoded.isDefined,
          decoded.getOrElse(fallbackFeatures(content, dim)))
      }
    }.toDF("media_id", "kind", "decoded", "features")
  }

  /** 64-bit perceptual hash over a feature vector — difference hash
    * (dHash): bit k is 1 iff feature k exceeds its cyclic successor.
    * Invariant to global brightness/gain shifts (any monotone
    * per-vector offset), which is exactly what survives re-encoding a
    * near-identical image or re-normalizing audio. Total over ANY
    * feature vector (decoded grid, audio buckets, or the byte-hash
    * fallback), so the near-dup pass needs no modality branching. */
  def perceptualHash64(features: Array[Float]): Long = {
    if (features.isEmpty) return 0L
    val n = math.min(features.length, 64)
    var h = 0L
    var i = 0
    while (i < n) {
      h <<= 1
      if (features(i) > features((i + 1) % n)) h |= 1L
      i += 1
    }
    h
  }

  /** Media near-duplicate candidates by perceptual hash: decode (the
    * real JDK path), dHash, band the 64 bits into four 16-bit keys,
    * bucket-join on any shared band, verify by Hamming distance.
    *
    * Scale shape — the image analog of the MinHash+LSH text path
    * (q47): ONE decode pass, 4 band rows per item (constant fan-out,
    * not a shingle explode), ONE shuffle on (band, key), pairs only
    * within buckets — never all-pairs — and the Hamming verify is a
    * codegen'd bit_count(xor). A 100 TB media corpus compares only
    * items that already agree on 16 perceptual bits. */
  def nearDupCandidates(spark: SparkSession, media: DataFrame,
      dim: Int = 64, maxHamming: Int = 6): DataFrame =
    nearDupFromPhashes(phashes(spark, media, dim), maxHamming)

  /** Decode + dHash once — (media_id, ph); feed [[nearDupFromPhashes]]
    * and any per-item reporting from the SAME frame so the decode pass
    * (the expensive part) runs once, not once per consumer. */
  def phashes(spark: SparkSession, media: DataFrame, dim: Int = 64): DataFrame = {
    graft.GraftFunctions.register(spark)
    decodeMediaFeatures(spark, media, dim)
      .select(col("media_id"), expr("phash64(features)").as("ph"))
  }

  /** MATERIALIZED-column ingest for media features: decode ONCE at
    * WRITE time and persist (media_id, kind, decoded, ph) as parquet —
    * the reference's MATERIALIZED column semantics (computed on
    * INSERT, stored, then read like any other column). Queries over
    * the written table — near-dup pairing above all — become pure
    * column reads: zero decode, scale-independent of payload size.
    * Idempotent via a CONTENT fingerprint, not a row count: the
    * order-independent count + bit_xor of xxhash64(media_id, content)
    * over the source (one narrow scan, no shuffle, no ANSI overflow)
    * is stamped into a sidecar next to the parquet — a corpus whose
    * payloads changed at equal row count refreshes, while repeated
    * analytics over an unchanged corpus pay the decode exactly once.
    * At 100 TB the decode belongs in the ingest pipeline, not in
    * every query. */
  def materializeFeatures(spark: SparkSession, media: DataFrame,
      path: String, dim: Int = 64): Unit = {
    graft.GraftFunctions.register(spark)
    // `kind` participates in the fingerprint: the decode path branches
    // on it, so a row whose kind changes at identical id/content must
    // refresh the materialization.
    val fp = media
      .select(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(media_id, kind, content))").as("fp"))
      .collect()(0)
    val expected =
      if (fp.isNullAt(1)) "empty" else s"${fp.getLong(0)}:${fp.getLong(1)}"
    // Hadoop FileSystem, not java.io.File: `path` may be on any
    // cluster filesystem (HDFS/object store), same as the parquet.
    val marker = new org.apache.hadoop.fs.Path(path, "_graft_content_fp")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    val fresh =
      try fs.exists(marker) && {
        val in = fs.open(marker)
        val bytes =
          try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
          finally in.close()
        new String(bytes, "UTF-8").trim == expected
      }
      catch { case scala.util.control.NonFatal(_) => false }
    if (!fresh) {
      decodeMediaFeatures(spark, media, dim)
        .select(col("media_id"), col("kind"), col("decoded"),
          expr("phash64(features)").as("ph"))
        .write.mode("overwrite").parquet(path)
      val out = fs.create(marker, true)
      try out.write(expected.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Band buckets over precomputed phashes: each item fans out to 4
    * (band, 16-bit key) rows, then ONE shuffle keyed (band, key)
    * aggregates bucket membership as a collect_list — the q47/q123
    * bucket-aggregate shape. EVERY item lands in exactly one bucket
    * per band (no size filter here), so band 0's buckets recover the
    * full per-item phash frame; consumers that reuse this frame for
    * both pairing and reporting share the SAME exchange, so the
    * decode pipeline below it runs once (a band self-JOIN instead
    * recomputed the whole decode scan on each side — r10 verdict). */
  def bandBuckets(hashed: DataFrame): DataFrame =
    hashed.select(col("media_id"), col("ph"),
      explode(expr(
        "transform(sequence(0, 3), b -> named_struct(" +
          "'band', b, 'key', CAST(shiftright(ph, b * 16) & 65535 AS INT)))"))
        .as("bk"))
      .select(col("media_id"), col("ph"), col("bk.band"), col("bk.key"))
      .groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("media_id"), col("ph"))).as("items"))

  /** Candidate pairs from [[bandBuckets]]: pairs via a bounded nested
    * explode INSIDE each bucket, Hamming-verified by a codegen'd
    * bit_count(xor) — never all-pairs. Hot-bucket cap: a degenerate
    * corpus (boilerplate images, silent audio) piles n items into one
    * (band, key) bucket and pairing would go quadratic; buckets
    * larger than 64 are skipped (the q47 cap), singletons pair with
    * nothing. */
  def pairsFromBuckets(buckets: DataFrame, maxHamming: Int = 6): DataFrame =
    buckets.filter(size(col("items")).between(2, 64))
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .where(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        expr("CAST(bit_count(a.ph ^ b.ph) AS INT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()

  /** LSH band bucketing + Hamming verify over precomputed phashes. */
  def nearDupFromPhashes(hashed: DataFrame, maxHamming: Int = 6): DataFrame =
    pairsFromBuckets(bandBuckets(hashed), maxHamming)

  /** Frame/sample extraction stub via mapPartitions — the imperative
    * per-partition batch shape (decoder state reused across rows in a
    * partition, rows streamed, nothing driver-side). Emits one row
    * per sampled "frame" (a byte slice every `stride` bytes).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int, frameLen: Int): DataFrame = {
    import spark.implicits._
    val ds = media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
    ds.mapPartitions { it =>
      // per-partition "decoder" allocated once, reused per row
      val buf = new Array[Byte](frameLen)
      it.flatMap { case (id, kind, content) =>
        Iterator.range(0, math.max(content.length - frameLen + 1, 0), stride).map { off =>
          System.arraycopy(content, off, buf, 0, frameLen)
          (id, kind, off, buf.clone())
        }
      }
    }.toDF("media_id", "kind", "frame_offset", "frame")
  }
}
