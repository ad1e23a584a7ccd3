package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt parser for the `User-agent: *` group, as a native expression
  * — ONE O(lines) pass per robots.txt (the round-15 `aggregate`-fold
  * spelling rebuilt its accumulator struct per line, copying the
  * rules-so-far array each time: O(lines·rules) per file, hostile against
  * RFC 9309 §2.4's requirement to handle >= 500 KiB files — ~25k lines).
  * This runs once per DOMAIN on the slim robots frame, never per URL row,
  * so an interpreted-eval inner loop with codegen'd dispatch (the
  * [[BmpDHash]] static-helper shape) is the right cost point.
  *
  * Semantics per RFC 9309 (public):
  *  - input capped at 500 KiB ([[RobotsRules.MaxBytes]] — the RFC's own
  *    minimum-processing bound; rules past it are ignored);
  *  - comments (`#…`) stripped, lines trimmed, CRLF tolerated, field
  *    names case-insensitive;
  *  - a RUN of consecutive `User-agent:` lines forms ONE group applying
  *    to all named agents; the group is kept if ANY of them is `*`;
  *  - only `Allow:` / `Disallow:` lines inside kept groups collect; an
  *    empty `Disallow:` value means "no restriction" — no rule;
  *  - RFC 9309 §2.2.3 wildcards: `*` in a rule path matches any char
  *    sequence, a TRAILING `$` anchors end-of-match (a non-trailing `$`
  *    is literal path text). Each wildcard rule is translated ONCE here
  *    into an anchored Java/RE2 regex (`^` + `\Q…\E`-quoted literal
  *    segments joined by `.*`, `$` for the anchor) so the per-URL match
  *    downstream is a single regex find — never a per-row re-translate.
  *
  * Output: `array<struct<allow boolean, prefix string, wild boolean,
  * pattern string>>` — `prefix` is the rule path EXACTLY as written
  * (wildcard chars included: RFC precedence is by octets of the rule
  * path, so downstream ranks on `length(prefix)` raw); `pattern` is the
  * translated regex for wildcard rules, null for literal ones (which
  * match by plain `startsWith`). */
case class RobotsRules(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RobotsRules.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_rules"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RobotsRules.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RobotsRules.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RobotsRules {

  /** RFC 9309 §2.4: crawlers MUST process at least 500 KiB of robots.txt
    * and MAY ignore the rest — this parser caps exactly there. */
  val MaxBytes: Int = 500 * 1024

  private[graft] val ruleType: StructType = StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("prefix", StringType, nullable = false),
    StructField("wild", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = true)))

  private[graft] val outType: DataType = ArrayType(ruleType, containsNull = false)

  /** `\Q…\E`-quote a literal segment (Java regex and RE2 both support
    * quoting, so the SAME pattern string is replayable by the DuckDB
    * oracle); an embedded `\E` is split out of the quoted run. */
  private def quoteLiteral(s: String): String =
    if (s.isEmpty) "" else "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"

  /** Translate one RFC 9309 rule path into an anchored regex: `*` -> `.*`,
    * trailing `$` -> end anchor, everything else quoted literally. */
  private[graft] def toPattern(path: String): String = {
    val endAnchor = path.endsWith("$")
    val body = if (endAnchor) path.substring(0, path.length - 1) else path
    // -1: keep trailing empty segments so "/a*" -> "^\Q/a\E.*"
    val segs = body.split("\\*", -1).map(quoteLiteral)
    "^" + segs.mkString(".*") + (if (endAnchor) "$" else "")
  }

  def compute(txt: UTF8String): ArrayData = {
    val full = txt.toString
    // cap on BYTES per the RFC; find a char boundary <= MaxBytes cheaply
    // by capping chars at MaxBytes (a char is >= 1 byte, so the char cap
    // never keeps more than MaxBytes bytes' worth of rule lines beyond
    // the last multi-byte run — and any truncation point is RFC-legal)
    val s = if (full.length > MaxBytes) full.substring(0, MaxBytes) else full
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var inStar = false
    var prevUa = false
    var i = 0
    val n = s.length
    while (i <= n) {
      val nl = s.indexOf('\n', i)
      val end = if (nl < 0) n else nl
      // strip comment + CR, then trim
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
          if (inStar && (low == "allow" || low == "disallow") && value.nonEmpty) {
            val wild = value.contains('*') || value.endsWith("$")
            out += InternalRow(
              low == "allow",
              UTF8String.fromString(value),
              wild,
              if (wild) UTF8String.fromString(toPattern(value)) else null)
          }
          prevUa = false
        }
      } else {
        // blank line: ends a UA run but NOT the group (RFC: groups end at
        // the next User-agent line, matching the round-15 fold's behavior)
        prevUa = false
      }
      i = end + 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  def apply(c: Column): Column =
    Bridge.column(RobotsRules(Bridge.expression(c)))
}
