package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt NON-RULE metadata, one O(lines) pass (the [[RobotsRules]]
  * shape and cap): `struct<crawl_delay double, sitemaps array<string>>`.
  *
  *  - `Crawl-delay` is the de-facto politeness extension (honored by
  *    Bing/Yandex; not part of RFC 9309 but ubiquitous in the wild and
  *    exactly what a fetch scheduler needs): the value from the
  *    `User-agent: *` group, seconds, fractional allowed; absent or
  *    unparseable → null. Group scoping matches [[RobotsRules]] —
  *    UA runs share a group, kept if any agent is `*`; first kept
  *    occurrence wins (repeats are author noise).
  *  - `Sitemap:` lines are GROUP-INDEPENDENT per the sitemaps protocol
  *    (sitemaps.org, public): every occurrence collects, in file order,
  *    duplicates preserved (dedup is the consumer's call). The value is
  *    an absolute URL; no validation here — the frontier's own
  *    admission gate judges it like any discovered link.
  *
  * Runs once per DOMAIN on the slim robots frame, never per URL row. */
case class RobotsMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RobotsMeta.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RobotsMeta.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RobotsMeta.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RobotsMeta {

  private[graft] val outType: DataType = StructType(Seq(
    StructField("crawl_delay", DoubleType, nullable = true),
    StructField("sitemaps", ArrayType(StringType, containsNull = false),
      nullable = false)))

  def compute(txt: UTF8String): InternalRow = {
    val full = txt.toString
    val s = if (full.length > RobotsRules.MaxBytes)
      full.substring(0, RobotsRules.MaxBytes) else full
    var delay: java.lang.Double = null
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[Any]
    var inStar = false
    var prevUa = false
    var i = 0
    val n = s.length
    while (i <= n) {
      val nl = s.indexOf('\n', i)
      val end = if (nl < 0) n else nl
      var hash = s.indexOf('#', i)
      if (hash < 0 || hash > end) hash = end
      var a = i
      var b = hash
      while (a < b && (s.charAt(a) <= ' ')) a += 1
      while (b > a && (s.charAt(b - 1) <= ' ')) b -= 1
      val line = s.substring(a, b)
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        val field = if (colon < 0) line else line.substring(0, colon)
        val value = if (colon < 0) "" else line.substring(colon + 1).trim
        val low = field.toLowerCase(java.util.Locale.ROOT)
        if (low == "user-agent") {
          inStar = (prevUa && inStar) || value == "*"
          prevUa = true
        } else {
          if (low == "sitemap" && value.nonEmpty)
            sitemaps += UTF8String.fromString(value)
          else if (low == "crawl-delay" && inStar && delay == null &&
            value.nonEmpty) {
            try {
              val d = java.lang.Double.parseDouble(value)
              if (d >= 0 && !d.isInfinite && !d.isNaN) delay = d
            } catch { case _: NumberFormatException => () }
          }
          prevUa = false
        }
      } else prevUa = false
      i = end + 1
    }
    InternalRow(
      if (delay == null) null else delay.doubleValue(),
      new GenericArrayData(sitemaps.toArray))
  }

  def apply(c: Column): Column =
    Bridge.column(RobotsMeta(Bridge.expression(c)))
}
