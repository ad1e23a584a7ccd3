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

/** All `<a …>body</a>` matches of a page as ONE native scan — the
  * per-page hot path of the whole link layer (round 21; the r20
  * verdict's remaining-regex item). Replaces
  * `arrays_zip(regexp_extract_all(h, aTagPattern, 1),
  * regexp_extract_all(h, aTagPattern, 2))`, which ran the quote-aware
  * alternation regex over the FULL page twice (Java regex pays the
  * alternation `(?:[^>"']|"[^"]*"|'[^']*')*` per character).
  *
  * EXACTNESS — mirrors Java regex semantics for the pattern
  * `(?is)<a\b((?:[^>"']|"[^"]*"|'[^']*')*)>(.*?)</a>` match by match:
  *  - candidates are leftmost non-overlapping: scanning resumes after a
  *    completed match's `</a>`, or one character past a failed
  *    candidate's `<`;
  *  - `<a` is ASCII-case-insensitive ((?i) without UNICODE_CASE) and
  *    `\b` requires the next UTF-16 unit to be a non-word char
  *    ([a-zA-Z0-9_]) or end of input;
  *  - the attribute run alternates bare segments (any char except
  *    `>"'`, newlines included under (?s)) with COMPLETE quoted runs
  *    (`"…"` / `'…'` — the inner run may contain `>` and the other
  *    quote); an unterminated quote, or end of input before the closing
  *    `>`, fails the candidate (the regex has no alternative parse:
  *    every star unit is forced, so first failure is definitive);
  *  - the body is the lazy shortest run to the first literal `</a>`
  *    (ASCII-case-insensitive `a`; no word boundary — `</a >` does NOT
  *    close); a page with no closer fails the candidate.
  * Output field names are "0" (attrs) and "1" (body) — arrays_zip's
  * naming, so the expression is a drop-in for the zipped spelling.
  * FunctionsSpec pins byte parity on fixture pages + adversarial HTML.
  */
case class ATagsExtract(child: Expression) extends UnaryExpression {

  private val structType = StructType(Seq(
    StructField("0", StringType, nullable = true),
    StructField("1", StringType, nullable = true)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_a_tags"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  def compute(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = 0
    while (p < n) {
      val lt = s.indexOf('<', p)
      if (lt < 0 || lt + 1 >= n) { p = n }
      else {
        val c1 = s.charAt(lt + 1)
        val isA = c1 == 'a' || c1 == 'A'
        val boundary = isA && (lt + 2 >= n || !isWord(s.charAt(lt + 2)))
        if (!boundary) { p = lt + 1 }
        else {
          // attribute run: bare chars / complete quoted runs, up to '>'
          var j = lt + 2
          var attrsEnd = -1
          var failed = false
          while (attrsEnd < 0 && !failed) {
            if (j >= n) failed = true
            else {
              val c = s.charAt(j)
              if (c == '>') attrsEnd = j
              else if (c == '"' || c == '\'') {
                val q = s.indexOf(c, j + 1)
                if (q < 0) failed = true else j = q + 1
              } else j += 1
            }
          }
          if (failed) { p = lt + 1 }
          else {
            // lazy body: first literal </a> (case-insensitive 'a')
            var m = attrsEnd + 1
            var close = -1
            while (close < 0 && m + 3 < n) {
              if (s.charAt(m) == '<' && s.charAt(m + 1) == '/' &&
                  (s.charAt(m + 2) == 'a' || s.charAt(m + 2) == 'A') &&
                  s.charAt(m + 3) == '>') close = m
              else m += 1
            }
            if (close < 0) { p = lt + 1 }
            else {
              out += InternalRow(
                UTF8String.fromString(s.substring(lt + 2, attrsEnd)),
                UTF8String.fromString(s.substring(attrsEnd + 1, close)))
              p = close + 4
            }
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(html: Any): Any =
    compute(html.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("aTags", this, classOf[ATagsExtract].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.compute($h);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object ATagsExtract {
  def apply(html: Column): Column =
    Bridge.column(ATagsExtract(Bridge.expression(html)))
}
