package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical ISO-8601 timestamp text at UTC, matching what the reference
  * translators emit via `DateTimeFormatter.ISO_OFFSET_DATE_TIME.withZone(UTC)`
  * over millisecond instants (GeotabTranslator.kt:89,108–109):
  *
  *  - offset rendered as `Z`
  *  - no fractional seconds when the instant is whole-second
  *    (GeotabTranslatorTest.kt:60 asserts `"2023-10-26T10:00:00Z"`)
  *  - millisecond (3-digit) fraction otherwise — instants are built with
  *    `Instant.ofEpochMilli`, so sub-millisecond digits never occur
  *
  * Everything here is Catalyst-expression-only (whole-stage-codegen friendly,
  * no UDFs). The session MUST run with `spark.sql.session.timeZone=UTC`,
  * which Verify/Bench/test harnesses all set.
  */
object IsoTime {

  /** epoch milliseconds → canonical ISO-8601 UTC string. Null-safe. */
  def isoFromEpochMillis(epochMs: Column): Column = {
    val base   = date_format(timestamp_millis(epochMs), "yyyy-MM-dd'T'HH:mm:ss")
    val msPart = pmod(epochMs, lit(1000L))
    when(epochMs.isNull, lit(null).cast("string"))
      .when(msPart === 0L, concat(base, lit("Z")))
      .otherwise(concat(base, lit("."), lpad(msPart.cast("string"), 3, "0"), lit("Z")))
  }

  /** epoch seconds → canonical ISO-8601 UTC string (CalAmpTranslator.kt:100–101).
    * try_multiply: under ANSI mode a plain ×1000 on an absurd epoch THROWS —
    * overflow must surface as NULL so callers fold it into the poison path
    * (the reference's Kotlin wraps silently and emits garbage; quarantining
    * is our documented divergence). */
  def isoFromEpochSeconds(epochS: Column): Column =
    isoFromEpochMillis(try_multiply(epochS, lit(1000L)))

  /** ISO-8601 string (offset or `Z`, optional fraction) → epoch millis.
    * Mirrors `Instant.parse(s).toEpochMilli()` (GeotabTranslator.kt:108) and
    * yields NULL on unparseable input instead of raising (the poison-message
    * path — GeotabTranslator.kt:154–157 drops such records). The explicit
    * patterns matter: a format-less try_to_timestamp also accepts bare dates
    * and space-separated datetimes that `Instant.parse` rejects, which would
    * admit records the reference drops. `Instant.parse` accepts 1–9
    * fractional digits, so beyond the dominant 0/3-digit shapes we fall
    * back through every other width (coalesce stops at the first hit, so
    * the common case pays for one parse — width 0 leads because the
    * reference formatter suppresses the fraction on whole seconds, which is
    * what the derived corpora overwhelmingly contain); sub-millisecond
    * digits truncate via unix_millis exactly as `toEpochMilli` does. */
  def epochMillisFromIso(iso: Column): Column = {
    val widths = Seq(0, 3, 1, 2, 4, 5, 6, 7, 8, 9)
    val pats = widths.map {
      case 0 => "yyyy-MM-dd'T'HH:mm:ssXXX"
      case n => s"yyyy-MM-dd'T'HH:mm:ss.${"S" * n}XXX"
    }
    unix_millis(coalesce(pats.map(p => try_to_timestamp(iso, lit(p))): _*))
  }
}
