package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt NON-RULE metadata, one O(lines) pass (the [[RobotsRules]]
  * shape, byte cap, and §2.2.1 per-agent group selection):
  * `struct<crawl_delay double, sitemaps array<string>>`.
  *
  *  - `Crawl-delay` is the de-facto politeness extension (honored by
  *    Bing/Yandex; not part of RFC 9309 but ubiquitous in the wild and
  *    exactly what a fetch scheduler needs): the value from the group
  *    SELECTED for the crawler's product token (most specific UA match,
  *    `*` fallback — [[RobotsText.specOf]]; `agent = "*"` reads exactly
  *    the `*` group, the pre-round-17 behavior), seconds, fractional
  *    allowed; absent or unparseable → null. First selected occurrence
  *    wins (repeats are author noise). A literal `0` parses as 0.0 —
  *    "no delay" is a real-world value; its politeness arithmetic
  *    (no cap) is pinned downstream in [[graft.ops.Url.crawlBudget]].
  *  - `Sitemap:` lines are GROUP-INDEPENDENT per the sitemaps protocol
  *    (sitemaps.org, public): every occurrence collects regardless of
  *    agent, in file order, duplicates preserved (dedup is the
  *    consumer's call). The value is an absolute URL; no validation
  *    here — the frontier's own admission gate judges it like any
  *    discovered link.
  *
  * Runs once per DOMAIN on the slim robots frame, never per URL row. */
case class RobotsMeta(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = RobotsMeta.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsMeta.compute(txt.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) =>
      s"${ev.value} = graft.functions.RobotsMeta.compute($t, $a);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsMeta {

  private[graft] val outType: DataType = StructType(Seq(
    StructField("crawl_delay", DoubleType, nullable = true),
    StructField("sitemaps", ArrayType(StringType, containsNull = false),
      nullable = false)))

  def compute(txt: UTF8String, agent: UTF8String): InternalRow = {
    val s = RobotsText.cap(txt)
    val agentLower = agent.toString.toLowerCase(java.util.Locale.ROOT)
    val best = RobotsText.bestSpec(s, agentLower)
    var delay: java.lang.Double = null
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[Any]
    var inSel = false
    var prevUa = false
    RobotsText.eachLine(s) { (low, value) =>
      if (low == "") {
        prevUa = false
      } else if (low == "user-agent") {
        val sp = RobotsText.specOf(
          value.toLowerCase(java.util.Locale.ROOT), agentLower)
        inSel = (prevUa && inSel) || sp == best
        prevUa = true
      } else {
        if (low == "sitemap" && value.nonEmpty)
          sitemaps += UTF8String.fromString(value)
        else if (low == "crawl-delay" && inSel && delay == null &&
          value.nonEmpty) {
          try {
            val d = java.lang.Double.parseDouble(value)
            if (d >= 0 && !d.isInfinite && !d.isNaN) delay = d
          } catch { case _: NumberFormatException => () }
        }
        prevUa = false
      }
    }
    InternalRow(
      if (delay == null) null else delay.doubleValue(),
      new GenericArrayData(sitemaps.toArray))
  }

  def apply(c: Column): Column = apply(c, org.apache.spark.sql.functions.lit("*"))

  def apply(c: Column, agent: Column): Column =
    Bridge.column(RobotsMeta(Bridge.expression(c), Bridge.expression(agent)))
}
