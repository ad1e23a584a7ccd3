package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: lay documents head-to-tail in token
  * space and cut fixed-length training sequences, so short docs share a
  * sequence instead of wasting pad tokens.
  *
  * Scale shape: packing is made embarrassingly parallel by first salting
  * docs into `numBuckets` independent streams (deterministic `doc_id %
  * numBuckets`), then running the cumulative-offset window WITHIN each
  * bucket — the only shuffle is the window's hash partition on bucket, and
  * no partition ever sees more than ~corpus/numBuckets rows. A single
  * global stream would be a one-partition sort; bucketing trades perfect
  * packing density for linear scalability (each bucket wastes at most one
  * partial tail sequence).
  *
  * A doc's bin is the sequence its FIRST token lands in ("streaming pack":
  * docs may straddle bins; the trainer's loader treats bins as contiguous
  * token ranges). Everything is a pure function of (doc_id, token count),
  * so the assignment is reproducible and oracle-checkable.
  */
object Packing {

  def seqPack(docs: DataFrame, tokensCol: Column, seqLen: Int = 256,
              numBuckets: Int = 8): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("bucket", pmod(col("doc_id"), lit(numBuckets)))
      .withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // interleaved bin id: seq_idx*numBuckets + bucket is collision-free at
      // ANY per-bucket stream length (a fixed bucket*K + seq_idx scheme
      // would overlap the next bucket's space once seq_idx exceeded K)
      .withColumn("bin",
        floor(col("offset") / seqLen).cast("long") * numBuckets + col("bucket"))
      .select(col("doc_id"), col("bucket").cast("long").as("bucket"),
        col("n_tokens"), col("offset"), col("bin"))
  }

  /** Overlapping token-window chunking (the RAG / long-context prep pass):
    * split each document into windows of `chunkSize` tokens advancing by
    * `stride` (< chunkSize ⇒ consecutive chunks overlap by chunkSize−stride
    * tokens, so no span is ever cut without context). Chunk count per doc is
    * 1 + ceil(max(nTokens − chunkSize, 0) / stride) — the final chunk is the
    * (possibly short) tail.
    *
    * Scale shape: entirely row-local (tokenize → sequence → explode), zero
    * shuffles; output size is input × ~chunkSize/stride, which is the
    * intended duplication factor, not overhead. The explode keeps the token
    * ARRAY on one row while slicing — document text never rides a shuffle. */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && chunkSize >= stride, "need 0 < stride <= chunkSize")
    val nChunks = lit(1) +
      ceil(greatest(col("nw") - chunkSize, lit(0)) / lit(stride.toDouble)).cast("int")
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
      .withColumn("nw", size(col("ws")))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), nChunks - 1)).as("ci"))
      // slice's start/length are IntegerType — keep ci int here, widen after
      .select(col("doc_id"), col("ci"),
        slice(col("ws"), col("ci") * stride + 1, lit(chunkSize)).as("chunk"))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
  }
}
