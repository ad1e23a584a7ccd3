package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter sketch build + probe for scan-side prefiltering (the same
  * machinery AQE's runtime row-level filtering uses). Build the sketch over
  * a catalog with [[bloomAggSized]] and attach it to the probe side as a
  * SCALAR SUBQUERY (`aggFrame.scalar()`) — might_contain REJECTS any sketch
  * input that is not a foldable constant or scalar subquery, so a
  * joined/broadcast column throws AnalysisException. Callers keep a
  * `coalesce(..., lit(false))` guard on the probe (a NULL-producing sketch
  * source would otherwise drop every row). False positives possible
  * (verify exactly afterwards), false negatives impossible (negatives skip
  * the verify). Spark's own `BloomFilterAggregate` is deliberately NOT
  * used for the build: it silently clamps sizing to the session's
  * runtime-filter conf caps, forcing session-wide conf mutation for large
  * catalogs (it produces the same serialized stream this module probes).
  */
object Bloom {

  /** True if `hashed` (same xxhash64 as the build side) may be in `bloom`. */
  def mightContain(bloom: Column, hashed: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(bloom), Bridge.expression(hashed)))

  /** Explicitly-sized bloom sketch over LongType hashes (`xxhash64` first),
    * as a typed Aggregator: sizes the
    * `org.apache.spark.util.sketch.BloomFilter` directly — requested
    * capacity honored, no conf involvement — and produces the serialized
    * BloomFilterImpl stream [[mightContain]] deserializes, with the same
    * putLong/mightContainLong hashing. Size `numBits` ≈ 8–10 bits/item for
    * ~1–2% false-positive rate. Empty input finishes the zero buffer — an
    * empty sketch (all probes false), not NULL.
    *
    * COST MODEL — read before sizing large: every partial-aggregation
    * buffer allocates the FULL numBits bitmap and java-serializes it
    * through the merge exchange, so a build over P input partitions
    * materializes P bitmaps and shuffles P×(numBits/8) bytes (e.g.
    * numBits=1e9 ⇒ ~125 MB per map-side buffer). For very large sizings,
    * bound P on the build side first — `coalesce(small_n)` on the hashed
    * frame (the build input is one narrow long column, so wide tasks are
    * cheap) — rather than letting the corpus's natural partitioning fan
    * the bitmap out. [[graft.ops.Dedup.incrementalDedup]] sizes to the
    * expected CATALOG count with this trade in mind. */
  def bloomAggSized(hashed: Column, expectedItems: Long, numBits: Long): Column = {
    val agg = new Aggregator[Long, BloomFilter, Array[Byte]] {
      override def zero: BloomFilter = BloomFilter.create(expectedItems, numBits)
      override def reduce(b: BloomFilter, a: Long): BloomFilter = { b.putLong(a); b }
      override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
        b1.mergeInPlace(b2)
      override def finish(b: BloomFilter): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        b.writeTo(out)
        out.toByteArray
      }
      // BloomFilterImpl round-trips java serialization via its own compact
      // writeTo/readFrom stream, so this buffer encoder is wire-efficient
      override def bufferEncoder: Encoder[BloomFilter] =
        Encoders.javaSerialization(classOf[BloomFilter])
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }
    functions.udaf(agg, Encoders.scalaLong).apply(hashed)
  }
}
