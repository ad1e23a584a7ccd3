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
}
