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

  /** epoch seconds → canonical ISO-8601 UTC string (CalAmpTranslator.kt:100–101). */
  def isoFromEpochSeconds(epochS: Column): Column = isoFromEpochMillis(epochS * 1000L)

  /** ISO-8601 string (offset or `Z`, optional fraction) → epoch milliseconds.
    * Mirrors `Instant.parse(s).toEpochMilli()` (GeotabTranslator.kt:108) and
    * yields NULL on unparseable input instead of raising (the poison-message
    * path — GeotabTranslator.kt:154–157 drops such records).
    */
  def epochMillisFromIso(iso: Column): Column = unix_millis(try_to_timestamp(iso))
}
