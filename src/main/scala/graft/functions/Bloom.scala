package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

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
}
