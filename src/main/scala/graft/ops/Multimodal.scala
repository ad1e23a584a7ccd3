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
    * vectorized decode UDF; one MessageDigest per partition, not per row).
    * Real decoding would open each payload with a codec here; the stub
    * derives deterministic dimensions from the payload's md5 so the result
    * is ORACLE-CHECKABLE (DuckDB recomputes the same formula from the same
    * hex digits — SparkEntry.mediaDecodeSql), not just shape-testable. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("doc_id", "mime", "payload").as[MediaRecord]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hv(c: Char): Int = "0123456789abcdef".indexOf(c)
        it.map { r =>
          // --- STUB decode: replace the md5-derived fake with a real codec
          // (javax.imageio / ffmpeg binding) when the runtime has one ---
          md.reset()
          val h = md.digest(r.payload).map("%02x".format(_)).mkString
          DecodedMedia(r.doc_id, r.mime, r.payload.length.toLong,
            width = hv(h(0)) * 16 + hv(h(1)) + 1,
            height = hv(h(2)) * 16 + hv(h(3)) + 1,
            frames = hv(h(4)) % 8 + 1)
        }
      }
  }

  /** Frame sampling as pure expressions: fixed-size byte frames, every
    * `stride`-th frame fingerprinted. Runs scan-fused (binary `substring` +
    * `md5` are codegen'd built-ins) — no row-object materialization, which
    * is the difference between this and a UDF at 100 TB of video payloads. */
  def frameSample(media: DataFrame, frameBytes: Int = 64,
                  stride: Int = 2): DataFrame =
    media.select(
      col("doc_id"),
      ceil(col("octet_len") / lit(frameBytes.toDouble)).cast("long").as("n_frames"),
      md5(substring(col("payload"), 1, frameBytes)).as("frame0_md5"),
      // guard must use STRIDE (an out-of-range binary substring md5s to the
      // empty-input digest, not NULL — a fingerprint for a nonexistent frame)
      when(col("octet_len") > stride * frameBytes,
        md5(substring(col("payload"), stride * frameBytes + 1, frameBytes)))
        .as(s"frame${stride}_md5"))
}
