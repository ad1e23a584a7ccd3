package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native fused squared-L2 distance Σ(aᵢ−bᵢ)² over two `array<bigint>`
  * columns — the k-means / IVF assignment hot loop over int8-quantized
  * embeddings (ops/Similarity.kmeansAssign), evaluated |corpus|·k times.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)),
  * 0L, _+_)` — allocates an intermediate array per row and walks two
  * CodegenFallback higher-order interpreters; this is one codegen'd loop
  * with no allocation (same rationale and structure as [[DotProduct]]).
  * Integer arithmetic, so the result is bit-exact under any evaluation
  * order. Semantics match the composable form: NULL when either side is
  * NULL or lengths differ; elements must be non-null.
  */
case class L2Squared(left: Expression, right: Expression)
  extends BinaryExpression {

  // Inputs must already be array<bigint> (quantizedVecs emits longs);
  // see DotProduct for why ExpectsInputTypes isn't available here.
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2Squared {
  /** Column-API form: `l2sq(col("a"), col("b"))`. */
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Squared(Bridge.expression(a), Bridge.expression(b)))
}
