package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.5): media payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition.
  *
  * The actual codec is STUBBED (this container has no image/audio libraries)
  * with a deterministic fake that derives "decoded" properties from the
  * payload bytes — the Spark-side plumbing (schema, encoders, partition-wise
  * batching, metadata extraction) is real and tested.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  final case class DecodedMedia(doc_id: Long, mime: String, octet_len: Long,
                                width: Int, height: Int, frames: Int)

  /** Wrap a text corpus as a media table: payload = UTF-8 bytes, plus the
    * expression-only metadata (length, sha256) the oracle can check. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload"),
      octet_length(col("text")).cast("long").as("octet_len"),
      sha2(col("text").cast("binary"), 256).as("payload_sha256"))

  /** Partition-batched "decode" (mapPartitions — the JVM analogue of a
    * vectorized decode UDF). Real decoding would open each payload with a
    * codec here; the stub derives deterministic dimensions from the bytes so
    * the pipeline shape is testable end-to-end. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("doc_id", "mime", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          // --- STUB: replace with a real codec (e.g. javax.imageio) ---
          val n = r.payload.length
          val h = java.util.Arrays.hashCode(r.payload)
          DecodedMedia(r.doc_id, r.mime, n.toLong,
            width = math.floorMod(h, 1920) + 1,
            height = math.floorMod(h / 1920, 1080) + 1,
            frames = 1)
        }
      }
  }
}
