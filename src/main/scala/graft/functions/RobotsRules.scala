package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt rule parser, as a native expression — ONE O(lines) pass per
  * robots.txt plus a first O(lines) group-selection pass (the round-15
  * `aggregate`-fold spelling rebuilt its accumulator struct per line,
  * copying the rules-so-far array each time: O(lines·rules) per file,
  * hostile against RFC 9309 §2.4's requirement to handle >= 500 KiB
  * files — ~25k lines). This runs once per DOMAIN on the slim robots
  * frame, never per URL row, so an interpreted-eval inner loop with
  * codegen'd dispatch (the [[BmpDHash]] static-helper shape) is the
  * right cost point.
  *
  * Semantics per RFC 9309 (public):
  *  - input capped at 500 KiB in BYTES ([[RobotsText.MaxBytes]] — the
  *    RFC's own minimum-processing bound; rules past it are ignored,
  *    and a hostile multi-MB file is never copied past the cap);
  *  - comments (`#…`) stripped, lines trimmed, CRLF tolerated, field
  *    names case-insensitive;
  *  - a RUN of consecutive `User-agent:` lines forms ONE group applying
  *    to all named agents;
  *  - §2.2.1 group SELECTION (round 17): the crawler's product token
  *    (`agent`, case-insensitive) binds to the MOST SPECIFIC matching
  *    user-agent value — exact match, extended to longest-prefix per
  *    the de-facto matcher ([[RobotsText.specOf]]) — falling back to
  *    the `*` group when no specific group matches; groups tied at the
  *    winning value all collect (the RFC's combine rule). `agent = "*"`
  *    selects exactly the `*` group (the pre-round-17 behavior);
  *  - only `Allow:` / `Disallow:` lines inside selected groups collect;
  *    an empty `Disallow:` value means "no restriction" — no rule;
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
case class RobotsRules(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = RobotsRules.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_rules"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsRules.compute(txt.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) =>
      s"${ev.value} = graft.functions.RobotsRules.compute($t, $a);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsRules {

  /** Kept as the public cap constant (UrlSpec and scaladocs reference it). */
  val MaxBytes: Int = RobotsText.MaxBytes

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

  def compute(txt: UTF8String, agent: UTF8String): ArrayData = {
    val s = RobotsText.cap(txt)
    val agentLower = agent.toString.toLowerCase(java.util.Locale.ROOT)
    // pass 1: which UA value wins for this token (0 = the * fallback)
    val best = RobotsText.bestSpec(s, agentLower)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var inSel = false
    var prevUa = false
    RobotsText.eachLine(s) { (low, value) =>
      if (low == "") {
        // blank line: ends a UA run but NOT the group (RFC: groups end
        // at the next User-agent line)
        prevUa = false
      } else if (low == "user-agent") {
        val sp = RobotsText.specOf(
          value.toLowerCase(java.util.Locale.ROOT), agentLower)
        inSel = (prevUa && inSel) || sp == best
        prevUa = true
      } else {
        if (inSel && (low == "allow" || low == "disallow") && value.nonEmpty) {
          val wild = value.contains('*') || value.endsWith("$")
          out += InternalRow(
            low == "allow",
            UTF8String.fromString(value),
            wild,
            if (wild) UTF8String.fromString(toPattern(value)) else null)
        }
        prevUa = false
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  def apply(c: Column): Column = apply(c, org.apache.spark.sql.functions.lit("*"))

  def apply(c: Column, agent: Column): Column =
    Bridge.column(RobotsRules(Bridge.expression(c), Bridge.expression(agent)))
}
