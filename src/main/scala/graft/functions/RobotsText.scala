package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Shared robots.txt text plumbing for [[RobotsRules]] and [[RobotsMeta]]
  * — the byte cap, the line scanner, and RFC 9309 §2.2.1 user-agent
  * group SELECTION. Both parsers are O(lines) two-pass: pass 1 finds the
  * most specific matching `User-agent:` value for the crawler's product
  * token, pass 2 collects from exactly the groups carrying that value.
  */
private[functions] object RobotsText {

  /** RFC 9309 §2.4: crawlers MUST process at least 500 KiB of robots.txt
    * and MAY ignore the rest — both parsers cap exactly there, in BYTES,
    * on the UTF8String slice BEFORE any String materializes (a hostile
    * multi-MB file never copies past the cap; round-16 ADVICE — the char
    * cap after toString kept up to ~3× the bytes AND paid the full
    * copy). The slice backs off to a UTF-8 char boundary so the
    * truncation never splits a code point. */
  val MaxBytes: Int = 500 * 1024

  def cap(txt: UTF8String): String = {
    if (txt.numBytes <= MaxBytes) return txt.toString
    var nb = MaxBytes
    // a continuation byte (10xxxxxx) at the cut means we're mid-char
    while (nb > 0 && (txt.getByte(nb) & 0xC0) == 0x80) nb -= 1
    UTF8String.fromAddress(txt.getBaseObject, txt.getBaseOffset, nb).toString
  }

  /** Specificity of one `User-agent:` line value for the crawler token
    * (both expected pre-lowercased): -1 = does not apply; 0 = the `*`
    * group (the RFC fallback); >0 = a specific match, ranked by value
    * length — per RFC 9309 §2.2.1 the crawler obeys the group matching
    * its product token, falling back to `*`; the de-facto matcher
    * (Google's public robots.txt spec) extends exact match to "longest
    * value that is a prefix of the token" so `googlebot` groups bind
    * `googlebot-news` when no more specific group exists — this
    * implements that superset (exact match is the full-length prefix,
    * so RFC-conformant files behave per the RFC). */
  def specOf(value: String, agentLower: String): Int =
    if (value == "*") 0
    else if (agentLower != "*" && value.nonEmpty && agentLower.startsWith(value))
      value.length
    else -1

  /** Pass 1: the best (most specific) matching UA specificity in the
    * file, 0 when only `*` (or nothing) matches. */
  def bestSpec(s: String, agentLower: String): Int = {
    var best = 0
    eachLine(s) { (field, value) =>
      if (field == "user-agent") {
        val sp = specOf(value.toLowerCase(java.util.Locale.ROOT), agentLower)
        if (sp > best) best = sp
      }
    }
    best
  }

  /** One pass over the (already capped) text: comments (`#…`) stripped,
    * CRLF tolerated, lines trimmed, `field: value` split with the field
    * lowercased — the caller sees only non-empty lines. A blank line is
    * surfaced as `("", "")` (it ends a UA run but not a group). */
  def eachLine(s: String)(f: (String, String) => Unit): Unit = {
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
      if (b > a) {
        val line = s.substring(a, b)
        val colon = line.indexOf(':')
        val field = if (colon < 0) line else line.substring(0, colon)
        val value = if (colon < 0) "" else line.substring(colon + 1).trim
        f(field.toLowerCase(java.util.Locale.ROOT), value)
      } else f("", "")
      i = end + 1
    }
  }
}
