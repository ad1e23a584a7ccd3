package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Encoded nearest-centroid argmin over a LITERAL centroid matrix — the
  * Lloyd-loop assignment hot path as ONE native codegen'd loop (round 20):
  * for each centroid i, enc_i = Σ(qv_j − c_ij)²·2²⁴ + i (the
  * assignToCentroids encoding — [[L2Squared]] distance, ties break to the
  * lowest dense index); returns min(enc_i). A `least(l2sq(...), ...×k)`
  * spelling builds a k·dim-literal Catalyst tree that costs ~1 s/round in
  * analysis + oversized-codegen at k=64 where this single expression is a
  * reference to one constant matrix and a two-level loop. Bit-identical to
  * the composed form: same integer arithmetic, same overflow wrap, same
  * tie rule (strict < keeps the first minimum = lowest index; the +i term
  * makes exact enc ties impossible).
  *
  * Semantics at the edges mirror min-over-encoded-l2sq: a centroid whose
  * length differs from qv contributes NULL (skipped); if every centroid is
  * skipped (or the matrix is empty) the result is NULL. NULL qv or matrix
  * → NULL (nullSafeEval).
  */
case class NearestCentroidEnc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid_enc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<array<bigint>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(qv: Any, cents: Any): Any =
    NearestCentroidEnc.compute(qv.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val boxed = ctx.freshName("enc")
      s"""
         |Long $boxed = graft.functions.NearestCentroidEnc.compute($q, $c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidEnc {
  private val Shift = 1L << 24

  /** Boxed so the no-matching-centroid edge can yield NULL. */
  def compute(qv: ArrayData, cents: ArrayData): java.lang.Long = {
    val k = cents.numElements()
    val d = qv.numElements()
    var best = Long.MaxValue
    var found = false
    var i = 0
    while (i < k) {
      val c = cents.getArray(i)
      if (c != null && c.numElements() == d) {
        var s = 0L
        var j = 0
        while (j < d) {
          val diff = qv.getLong(j) - c.getLong(j)
          s += diff * diff
          j += 1
        }
        val enc = s * Shift + i
        if (!found || enc < best) { best = enc; found = true }
      }
      i += 1
    }
    if (found) java.lang.Long.valueOf(best) else null
  }

  /** Column-API form; `cents` must be a foldable array<array<bigint>>. */
  def apply(qv: Column, cents: Column): Column =
    Bridge.column(NearestCentroidEnc(Bridge.expression(qv),
      Bridge.expression(cents)))
}
