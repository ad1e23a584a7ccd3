package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, TernaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}
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

  /** Probe one shard of a hash-prefix-sharded bloom family (see
    * [[graft.ops.Dedup.incrementalDedup]]'s `shards` parameter): true if
    * `hashed` may be in the `sketch` whose shard id is `shard`. Unlike
    * [[mightContain]], the sketch arrives as an ordinary per-row COLUMN
    * (joined in from the `(shard, sketch)` table), which is exactly what
    * `BloomFilterMightContain` rejects — it deserializes its sketch once
    * per expression because it requires a foldable input. This expression
    * instead deserializes lazily PER SHARD ID: rows carrying the same
    * `shard` reuse the cached [[BloomFilter]], so the per-row cost is one
    * map lookup + the probe, and per-task memory is only the shards that
    * task's rows actually touch (after a shuffle join on `shard`, that is
    * |shards|/|tasks| of the family — the property that lets the total
    * sketch family exceed single-executor memory). */
  def shardedMightContain(shard: Column, sketch: Column, hashed: Column): Column =
    Bridge.column(ShardedBloomMightContain(Bridge.expression(shard),
      Bridge.expression(sketch), Bridge.expression(hashed)))
}

/** `shardedMightContain`'s expression: (shard INT, sketch BINARY, hash
  * LONG) → BOOLEAN. The shard-keyed cache is sound because within one
  * probe join each shard id maps to exactly one sketch (the build side
  * groups BY shard); a task-local (deserialized-per-task) expression
  * instance can therefore never see two different byte images for one id.
  * Not thread-safe ACROSS tasks by design — each task deserializes its own
  * copy of the plan, so the map is task-private. */
case class ShardedBloomMightContain(first: Expression, second: Expression,
                                    third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sharded_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == IntegerType && second.dataType == BinaryType &&
      third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, binary, bigint) inputs, got " +
        s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString})")

  @transient private lazy val cache =
    scala.collection.mutable.HashMap.empty[Int, BloomFilter]

  /** Called per row from both eval paths (the codegen'd call is a method
    * dispatch on this instance via addReferenceObj — the same shape as
    * BloomFilterMightContain's scalar function). */
  def probe(shard: Int, sketch: Array[Byte], hashed: Long): Boolean =
    cache.getOrElseUpdate(shard,
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(sketch)))
      .mightContainLong(hashed)

  override def nullSafeEval(s: Any, b: Any, h: Any): Any =
    probe(s.asInstanceOf[Int], b.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardedBloom", this,
      classOf[ShardedBloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (s, b, h) =>
      s"${ev.value} = $ref.probe($s, $b, $h);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
