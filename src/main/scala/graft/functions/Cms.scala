package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch build + probe — the FREQUENCY sibling of [[Bloom]]
  * (membership): estimate per-key occurrence counts with one-sided error
  * (never underestimates; overestimates by ≤ εN with probability 1−δ,
  * ε ≈ e/width, δ ≈ e^-depth). The heavy-hitters pattern this backs
  * (ops/TextAnalysis.frequentNgrams): probe the sketch scan-side, let only
  * candidate keys (estimate ≥ threshold — a SUPERSET of the truth) reach
  * the exact group-by, then verify exactly. Output is exact and
  * seed-independent; the sketch only decides how much of the key tail
  * never shuffles.
  *
  * UNLIKE a bloom filter, the sketch's size is FIXED by (depth, width) —
  * independent of how many items it absorbed — so there is no catalog-size
  * ceiling and no sharded variant is needed: for a FRACTION threshold
  * φ·N, width ≈ 3/φ bounds spurious candidates regardless of corpus
  * size. The cost model matches [[Bloom.bloomAggSized]]: every partial
  * buffer allocates the full depth×width long table (width 2¹⁶ × depth 5
  * ≈ 2.6 MB) and java-serializes through the merge exchange. */
object Cms {

  /** Count-min sketch over LongType hashes (`xxhash64` first) as a typed
    * Aggregator, attached to the probe side as a SCALAR SUBQUERY
    * (`aggFrame.scalar()` — the same contract as [[Bloom.bloomAggSized]]).
    * Deterministic for a fixed seed: counter sums commute, so any
    * partitioning or merge order yields the same table. Empty input
    * finishes the zero buffer — an empty sketch (all estimates 0), not
    * NULL. */
  def cmsAggSized(hashed: Column, depth: Int, width: Int,
                  seed: Int = 42): Column = {
    val agg = new Aggregatorish(depth, width, seed)
    functions.udaf(agg, Encoders.scalaLong).apply(hashed)
  }

  // named class, not an anonymous Aggregator: the closure captures only
  // the three int params, keeping the serialized task payload minimal
  private class Aggregatorish(depth: Int, width: Int, seed: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Long, CountMinSketch, Array[Byte]] {
    override def zero: CountMinSketch = CountMinSketch.create(depth, width, seed)
    override def reduce(b: CountMinSketch, a: Long): CountMinSketch = {
      b.addLong(a); b
    }
    override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
      b1.mergeInPlace(b2)
    override def finish(b: CountMinSketch): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    }
    override def bufferEncoder: Encoder[CountMinSketch] =
      Encoders.javaSerialization(classOf[CountMinSketch])
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Estimated occurrence count of `hashed` (same xxhash64 as the build
    * side) in `sketch`. The sketch input must be a foldable constant or
    * scalar subquery (the [[Bloom.mightContain]] contract) — it is
    * deserialized ONCE per task, not per row. NULL sketch → NULL. */
  def estimate(sketch: Column, hashed: Column): Column =
    Bridge.column(CmsEstimate(
      Bridge.expression(sketch), Bridge.expression(hashed)))
}

/** `Cms.estimate`'s expression: (sketch BINARY — foldable/scalar-subquery,
  * hash LONG) → LONG. The sketch child evaluates row-independently (scalar
  * subqueries are literal-substituted before execution), so one lazy
  * deserialization per task-local expression instance serves every row —
  * the same once-per-task shape as `BloomFilterMightContain`. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, bigint) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  /** Deserialized once per task-local expression instance — the sketch
    * child is row-independent by contract (scalar subqueries are
    * literal-substituted before execution; the per-row `s` argument below
    * is therefore always the same byte image), the same once-per-task
    * shape as `BloomFilterMightContain`. */
  @transient private var cached: CountMinSketch = _

  /** Called per row from both eval paths (codegen dispatches on this
    * instance via addReferenceObj — the [[ShardedBloomMightContain]]
    * pattern, minus the shard key: one sketch per expression). */
  def probe(sketch: Array[Byte], hashed: Long): Long = {
    if (cached == null)
      cached = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch))
    cached.estimateCount(hashed)
  }

  override def nullSafeEval(s: Any, h: Any): Any =
    probe(s.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this,
      classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (s, h) => s"${ev.value} = $ref.probe($s, $h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
