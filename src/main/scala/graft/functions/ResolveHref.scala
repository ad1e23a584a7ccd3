package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 reference resolution (scheme/protocol-relative/query-only/
  * root-relative/path-relative + §5.2.4 dot-segment removal) as ONE
  * native expression (round 20). The composed spelling references its
  * base at ~8 leaves and folds dot segments with an `aggregate`
  * higher-order function — CodegenFallback, an array rebuild per
  * accumulated segment PER LINK ROW — inside linkExtract's per-link hot
  * path (every link_* / discovery / frontier / meta-refresh /
  * rel-canonical query). EXACTNESS: mirrors the composed tree primitive
  * by primitive — same UTF8String substring arithmetic, the same String
  * round-trips where the composed form used regex (`rlike` scheme probe,
  * the `[^/]*$` directory strip, `split("/")`), the same fold semantics
  * (`..` drops the last kept segment, `.`/empty skip, root `..` no-op,
  * trailing-slash re-append), byte-level concat. FunctionsSpec pins
  * parity against the composed form. */
case class ResolveHref(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_resolve_href"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(base: Any, href: Any): Any =
    ResolveHref.compute(base.asInstanceOf[UTF8String],
      href.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.ResolveHref.compute($b, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ResolveHref {
  private val SEP = UTF8String.fromString("://")
  private val SLASH = UTF8String.fromString("/")
  private val DSLASH = UTF8String.fromString("//")
  private val QMARK = UTF8String.fromString("?")
  private val COLON = UTF8String.fromString(":")
  private val DOT = UTF8String.fromString(".")
  private val DDOT = UTF8String.fromString("..")
  private val BIG = 1 << 20
  private val SchemeRe =
    java.util.regex.Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://")
  private val TrailRe = java.util.regex.Pattern.compile("[^/]*$")

  /** §5.2.4 over `pq` (path [+ query, untouched]) — the composed
    * removeDotSegments verbatim. */
  private def removeDotSegments(pq: UTF8String): UTF8String = {
    val path = pq.subStringIndex(QMARK, 1)
    val query = pq.substringSQL(path.numChars + 1, BIG)
    val segs = path.split(SLASH, -1)
    val acc = new java.util.ArrayList[UTF8String](segs.length)
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (s.equals(DDOT)) { if (!acc.isEmpty) acc.remove(acc.size - 1) }
      else if (s.numBytes > 0 && !s.equals(DOT)) acc.add(s)
      i += 1
    }
    val arr = new Array[UTF8String](acc.size)
    acc.toArray(arr)
    val joined = UTF8String.concat(SLASH,
      UTF8String.concatWs(SLASH, arr: _*))
    val kept =
      if (path.endsWith(SLASH) && !joined.endsWith(SLASH))
        UTF8String.concat(joined, SLASH)
      else joined
    UTF8String.concat(kept, query)
  }

  def compute(baseCanon: UTF8String, href: UTF8String): UTF8String = {
    if (SchemeRe.matcher(href.toString).find()) return href
    val scheme = baseCanon.subStringIndex(SEP, 1)
    if (href.startsWith(DSLASH))
      return UTF8String.concat(scheme, COLON, href)
    val afterScheme = baseCanon.substringSQL(scheme.numChars + 4, BIG)
    val hostport = afterScheme.subStringIndex(SLASH, 1)
    val root = UTF8String.concat(scheme, SEP, hostport)
    if (href.startsWith(QMARK)) {
      // §5.3 query-only reference: base PATH kept, query replaced
      val pq = afterScheme.substringSQL(hostport.numChars + 1, BIG)
      val basePath = pq.subStringIndex(QMARK, 1)
      return UTF8String.concat(root, basePath, href)
    }
    if (href.startsWith(SLASH))
      return UTF8String.concat(root, removeDotSegments(href))
    val pq = afterScheme.substringSQL(hostport.numChars + 1, BIG)
    val basePath = pq.subStringIndex(QMARK, 1)
    // the composed `regexp_replace(basePath, "[^/]*$", "")` directory
    // strip, String round-trip included
    val dir = UTF8String.fromString(
      TrailRe.matcher(basePath.toString).replaceAll(""))
    UTF8String.concat(root,
      removeDotSegments(UTF8String.concat(dir, href)))
  }

  def apply(baseCanon: Column, href: Column): Column =
    Bridge.column(ResolveHref(Bridge.expression(baseCanon),
      Bridge.expression(href)))
}

/** The C4-minimal entity decode (`&lt; &gt; &quot; &#39; &nbsp;` then
  * `&amp;` LAST) as one native pass — the composed form chained six
  * regexp_replace calls, each a String round-trip per value per link row.
  * Literal sequential replacement in the same order ≡ the regex fold
  * (every pattern is metacharacter-free). */
case class DecodeEntities(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decode_entities"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(s: Any): Any =
    DecodeEntities.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DecodeEntities.compute($s);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object DecodeEntities {
  def compute(s: UTF8String): UTF8String = {
    // fast path: no '&' anywhere → the value round-trips unchanged
    // through all six regexp_replace calls in the composed form EXCEPT
    // for their String re-encode; mirror that re-encode for byte parity
    var t = s.toString
    if (t.indexOf('&') >= 0) {
      t = t.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'")
        .replace("&nbsp;", " ").replace("&amp;", "&")
    }
    UTF8String.fromString(t)
  }

  def apply(c: Column): Column =
    Bridge.column(DecodeEntities(Bridge.expression(c)))
}
