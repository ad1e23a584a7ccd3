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

  // timestamp_millis converts to micros with Math.multiplyExact: beyond
  // |Long.MaxValue/1000| ms it THROWS (ANSI-independent) — an absurd but
  // schema-valid epoch must surface as NULL (the quarantine path), never
  // kill the job. Also beyond java.time's own +/-year-999999999 instant
  // range date_format would fail; the micros bound is hit first.
  private val MaxSafeMs = Long.MaxValue / 1000L

  /** True iff the epoch-millis value survives [[isoFromEpochMillis]] —
    * translators include this in their validity gate so an unrepresentable
    * epoch QUARANTINES (matching the "poison the record" divergence
    * contract) instead of passing through with a NULL dateTime.
    * between(), not abs()<=: under non-ANSI SQL abs(Long.MinValue) wraps
    * to Long.MinValue (negative), so an abs-guard PASSES the one value it
    * exists to reject and timestamp_millis throws anyway. */
  def representableMs(epochMs: Column): Column =
    epochMs.between(-MaxSafeMs, MaxSafeMs)

  /** epoch milliseconds → canonical ISO-8601 UTC string. Null-safe; an
    * out-of-range epoch (|ms| > Long.MaxValue/1000, where the millis→micros
    * conversion overflows) yields NULL instead of an ArithmeticException —
    * poison the record, never the job. */
  def isoFromEpochMillis(epochMs: Column): Column = {
    val safe   = when(epochMs.between(-MaxSafeMs, MaxSafeMs), epochMs)
    val base   = date_format(timestamp_millis(safe), "yyyy-MM-dd'T'HH:mm:ss")
    val msPart = pmod(safe, lit(1000L))
    when(safe.isNull, lit(null).cast("string"))
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
    * admit records the reference drops.
    *
    * Pattern set: Spark's 'S' parser accepts any fraction length in
    * [1, count(S)] (measured), so widths {0, 3, 9} cover all of
    * `Instant.parse`'s 0–9 fractional digits — width 0 leads because the
    * reference formatter suppresses the fraction on whole seconds (the
    * overwhelmingly common derived shape), 3 catches the millisecond form,
    * 9 subsumes every other width. `Instant.parse` also accepts
    * seconds-bearing offsets (+05:30:15), which XXX (hour:minute) rejects —
    * the XXXXX spellings admit those. Sub-millisecond digits truncate via
    * unix_millis exactly as `toEpochMilli` does. */
  def epochMillisFromIso(iso: Column): Column = {
    val pats = Seq(0, 3, 9).flatMap { n =>
      val frac = if (n == 0) "" else s".${"S" * n}"
      Seq(s"yyyy-MM-dd'T'HH:mm:ss${frac}XXX",
          s"yyyy-MM-dd'T'HH:mm:ss${frac}XXXXX")
    }
    unix_millis(coalesce(pats.map(p => try_to_timestamp(iso, lit(p))): _*))
  }
}
