package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

/** Column-API access to Spark's internal bloom-filter sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same machinery
  * AQE's runtime row-level filtering uses, public classes but not in the
  * function registry). The sketch is a binary column: build it over a
  * catalog with [[bloomAgg]], broadcast the 1-row frame, and prefilter a
  * scan with [[mightContain]] — false positives possible (verify exactly
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
}
