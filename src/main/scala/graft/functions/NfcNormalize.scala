package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * expression — Spark ships no normalizer builtin, and the curation
  * pipelines that dedup on text NEED one: the same visible string arrives
  * from real crawls in composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) forms, which hash apart and defeat exact/minhash dedup.
  * One JVM `java.text.Normalizer` call per row (already-NFC input is a
  * cheap `isNormalized` scan — the overwhelmingly common case on ASCII
  * corpora), codegen'd through the same static-helper shape as
  * [[BmpDHash]]. The DuckDB oracle replays with its `nfc_normalize`
  * (both implement UAX #15 — the SAME canonical forms by spec). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // isNormalized is a scan without allocation — on ASCII (or any
    // already-composed) text the expensive normalize call is skipped and
    // the ORIGINAL UTF8String returns, no re-encode
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
