package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the two hottest URL expressions (round 20). The
  * composed Catalyst spellings ([[graft.ops.Url.canonicalizeUrlComposed]] /
  * [[graft.ops.Url.registrableDomainComposed]]) inline their input into
  * dozens of leaves (substring offsets re-derive every prefix; the PSL
  * matcher probes the trailing-label extractions at ~10 arms), so every
  * URL-family plan carried 10²–10³ expression nodes PER CALL SITE —
  * 300–750 KB of plan text on the discovery chains, taxing analysis,
  * optimizer transforms, codegen size and per-task plan serialization, and
  * re-running the string work once per reference. Each native expression
  * is ONE tree node and one O(|url|) compiled pass.
  *
  * EXACTNESS CONTRACT: `compute` mirrors the composed tree primitive by
  * primitive via the SAME UTF8String operations Catalyst's expressions
  * call (`subStringIndex`, `substringSQL`, `toLowerCase`, `split`,
  * byte-binary compare/sort), including their String round-trips
  * (regexp_replace and split re-encode through java.lang.String), so
  * outputs are byte-identical — FunctionsSpec pins parity against the
  * composed spellings over the fixture corpora and adversarial strings,
  * and every URL oracle replays unchanged.
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_canonicalize_url"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(url: Any): Any =
    CanonicalizeUrl.compute(url.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u =>
      s"${ev.value} = graft.functions.CanonicalizeUrl.compute($u);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object CanonicalizeUrl {
  private val HASH = UTF8String.fromString("#")
  private val SEP = UTF8String.fromString("://")
  private val QMARK = UTF8String.fromString("?")
  private val SLASH = UTF8String.fromString("/")
  private val COLON = UTF8String.fromString(":")
  private val AMP = UTF8String.fromString("&")
  private val EQ = UTF8String.fromString("=")
  private val HTTP = UTF8String.fromString("http")
  private val HTTPS = UTF8String.fromString("https")
  private val P80 = UTF8String.fromString("80")
  private val P443 = UTF8String.fromString("443")
  private val UTM = UTF8String.fromString("utm_")
  private val FBCLID = UTF8String.fromString("fbclid")
  private val GCLID = UTF8String.fromString("gclid")
  private val BIG = 1 << 20

  /** Byte-exact mirror of the composed canonicalizeUrl tree — see the
    * scaladoc header for the contract; the step numbers match the
    * composed spelling's. */
  def compute(url: UTF8String): UTF8String = {
    // 1. fragment off, scheme lowercased
    val base = url.subStringIndex(HASH, 1)
    val scheme = base.subStringIndex(SEP, 1).toLowerCase
    val afterScheme = base.substringSQL(scheme.numChars + 4, BIG)
    val beforeQuery = afterScheme.subStringIndex(QMARK, 1)
    // everything after the FIRST '?' (offset arithmetic — the composed
    // spelling's rawQuery)
    val rawQuery =
      if (afterScheme.contains(QMARK))
        afterScheme.substringSQL(beforeQuery.numChars + 2, BIG)
      else UTF8String.EMPTY_UTF8
    val hostport = beforeQuery.subStringIndex(SLASH, 1)
    val rawPath = beforeQuery.substringSQL(hostport.numChars + 1, BIG)
    // 2. host lowercased, leading www. stripped; regexp_replace
    //    re-encodes through String whether or not it matches — mirrored
    val host0 = hostport.subStringIndex(COLON, 1).toLowerCase.toString
    val host = UTF8String.fromString(
      if (host0.startsWith("www.")) host0.substring(4) else host0)
    val port =
      if (hostport.contains(COLON)) hostport.subStringIndex(COLON, -1)
      else UTF8String.EMPTY_UTF8
    val dropPort = port.numBytes == 0 ||
      (scheme.equals(HTTP) && port.equals(P80)) ||
      (scheme.equals(HTTPS) && port.equals(P443))
    // 4. tracking params out, survivors byte-lexicographically sorted
    //    (split re-encodes through String — the StringSplit path)
    val parts = rawQuery.split(AMP, -1)
    val kept = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.numBytes > 0) {
        val key = p.subStringIndex(EQ, 1)
        if (!key.startsWith(UTM) && !key.equals(FBCLID) && !key.equals(GCLID))
          kept.add(p)
      }
      i += 1
    }
    java.util.Collections.sort(kept) // UTF8String.compareTo = binary, array_sort's
    // 5. trailing slash off non-root paths, empty path becomes "/"
    val canonPath =
      if (rawPath.numBytes == 0) SLASH
      else if (!rawPath.equals(SLASH) && rawPath.endsWith(SLASH))
        rawPath.substringSQL(1, rawPath.numChars - 1)
      else rawPath
    // assemble at the BYTE level (Catalyst concat joins UTF8String bytes;
    // a String round-trip here would diverge on non-UTF-8 byte content)
    val keptPort =
      if (dropPort) UTF8String.EMPTY_UTF8 else UTF8String.concat(COLON, port)
    val canonQuery =
      if (kept.isEmpty) UTF8String.EMPTY_UTF8
      else {
        val joined = new Array[UTF8String](kept.size)
        kept.toArray(joined)
        UTF8String.concat(QMARK, UTF8String.concatWs(AMP, joined: _*))
      }
    UTF8String.concat(scheme, SEP, host, keptPort, canonPath, canonQuery)
  }

  def apply(url: Column): Column =
    Bridge.column(CanonicalizeUrl(Bridge.expression(url)))
}

/** PSL-aware registrable domain of a canonical URL as ONE native
  * expression — see [[CanonicalizeUrl]]'s header for why and for the
  * exactness contract. The PSL rule sets arrive as constructor data from
  * [[graft.ops.Url]] (one load, no drift with the oracle's generated
  * IN-lists). Trailing-label extraction mirrors the composed spelling's
  * `regexp_extract(bare, "([^.]+(\.[^.]+){k-1})$", 1)` semantics exactly:
  * the last k dot-separated labels when all k are non-empty, else "",
  * computed over the same String round-trip regexp_extract performs;
  * the `orBare` fallbacks return the ORIGINAL byte content. */
case class RegistrableDomain(child: Expression,
                             exc3: Set[String], exc2: Set[String],
                             wild2: Set[String], suffix3: Set[String],
                             wild1: Set[String], suffix2: Set[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_registrable_domain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  def compute(urlCanon: UTF8String): UTF8String = {
    import RegistrableDomain._
    val scheme = urlCanon.subStringIndex(SEP, 1)
    val afterScheme = urlCanon.substringSQL(scheme.numChars + 4, BIG)
    val host = afterScheme.subStringIndex(SLASH, 1)
    val bare = host.subStringIndex(COLON, 1)
    val s = bare.toString
    val parts = s.split("\\.", -1)
    def lastK(k: Int): String = {
      if (parts.length < k) return ""
      var i = parts.length - k
      while (i < parts.length) {
        if (parts(i).isEmpty) return ""
        i += 1
      }
      val sb = new java.lang.StringBuilder
      i = parts.length - k
      while (i < parts.length) {
        if (i > parts.length - k) sb.append('.')
        sb.append(parts(i))
        i += 1
      }
      sb.toString
    }
    val last1 = lastK(1); val last2 = lastK(2)
    val last3 = lastK(3); val last4 = lastK(4)
    def orBare(l: String): UTF8String =
      if (l.isEmpty) bare else UTF8String.fromString(l)
    if (exc3.contains(last3) && last3.nonEmpty) UTF8String.fromString(last3)
    else if (exc2.contains(last2) && last2.nonEmpty) UTF8String.fromString(last2)
    else if (wild2.contains(last2) && last2.nonEmpty) orBare(last4)
    else if (suffix3.contains(last3) && last3.nonEmpty) orBare(last4)
    else if (wild1.contains(last1) && last1.nonEmpty) orBare(last3)
    else if (suffix2.contains(last2) && last2.nonEmpty) orBare(last3)
    else UTF8String.fromString(last2)
  }

  override def nullSafeEval(urlCanon: Any): Any =
    compute(urlCanon.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("registrableDomain", this,
      classOf[RegistrableDomain].getName)
    nullSafeCodeGen(ctx, ev, u => s"${ev.value} = $ref.compute($u);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object RegistrableDomain {
  private val SEP = UTF8String.fromString("://")
  private val SLASH = UTF8String.fromString("/")
  private val COLON = UTF8String.fromString(":")
  private val BIG = 1 << 20
}
