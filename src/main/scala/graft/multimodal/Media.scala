package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` content
  * plus typed metadata, with decode / feature-extract / frame-sample
  * as batch operations.
  *
  * The decode step is a STUB — this environment has no image/audio
  * codecs — implemented as a deterministic byte-level feature hash so
  * the Spark-side plumbing (schema, partitioning, per-partition batch
  * shape, feature column type Array[Float]) is real and testable. A
  * production build swaps `fakeDecodeFeatures`'s body for a codec
  * call; every signature and plan stays identical.
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
