package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Column-API access to Spark's internal bloom-filter sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same machinery
  * AQE's runtime row-level filtering uses, public classes but not in the
  * function registry). Build the sketch over a catalog with [[bloomAgg]]
  * and attach it to the probe side as a SCALAR SUBQUERY
  * (`aggFrame.scalar()`) — might_contain REJECTS any sketch input that is
  * not a foldable constant or scalar subquery, so a joined/broadcast
  * column throws AnalysisException. Over an empty build side the aggregate
  * is NULL and might_contain propagates it — callers must
  * `coalesce(..., lit(false))`. False positives possible (verify exactly
  * afterwards), false negatives impossible (negatives skip the verify).
  */
object Bloom {

  /** Aggregate a bloom filter over `xxhash64(...)`-hashed values (child must
    * be LongType — hash first). Size `numBits` ≈ 8–10 bits/item for ~1–2%
    * false-positive rate. */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(hashed),
      Literal(expectedItems),
      Literal(numBits)).toAggregateExpression())

  /** True if `hashed` (same xxhash64 as the build side) may be in `bloom`. */
  def mightContain(bloom: Column, hashed: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(bloom), Bridge.expression(hashed)))

  /** Explicitly-sized bloom sketch over LongType hashes, as a typed
    * Aggregator. BloomFilterAggregate silently clamps its sizing to the
    * session's runtime-filter conf caps (default maxNumBits = 2^26), which
    * forces callers that need a bigger sketch to raise SESSION-WIDE confs;
    * this aggregator sizes the `org.apache.spark.util.sketch.BloomFilter`
    * directly, so the requested capacity is honored with no conf mutation.
    * It produces the same serialized BloomFilterImpl stream that
    * [[mightContain]]/BloomFilterMightContain deserializes, and uses the
    * same putLong/mightContainLong hashing, so probe code is unchanged.
    * Empty input finishes the zero buffer — an empty sketch (all probes
    * false) rather than BloomFilterAggregate's NULL; callers keeping the
    * defensive coalesce lose nothing. */
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
