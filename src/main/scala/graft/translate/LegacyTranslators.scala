package graft.translate

import graft.time.IsoTime
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One legacy business-event translator's behavior. The five translator
  * sources are absent from the reference tree; this spec is fully recovered
  * from their integration tests (TranslatorsIntegrationTest.kt:259–370) and
  * deployment wiring (bootstrap.sh:107–161).
  *
  * @param tsIsEpochSeconds when true the timestamp input field is epoch
  *        seconds and is canonicalized to ISO-8601; when false it is already
  *        an ISO-8601 string and passes through unchanged.
  */
final case class LegacySpec(
    name: String,
    source: String,
    eventType: String,
    tsField: String,
    tsIsEpochSeconds: Boolean,
    requiredFields: Seq[String])

/** The legacy `CommonEvent` pipeline generation: 5 per-source translators
  * emitting `{eventId, source, eventType, timestamp, data}` envelopes
  * (TranslatorsIntegrationTest.kt:223–231), all expressed as ONE
  * parameterized Catalyst projection — the per-source differences are pure
  * data (`LegacySpec`), so adding a source is a config change, not code.
  */
object LegacyTranslators {

  val userProfile: LegacySpec = LegacySpec("user-profile", "user-service",
    "USER_PROFILE_EVENT", "created", tsIsEpochSeconds = true, Seq("uid", "name", "created"))
  val orderRecord: LegacySpec = LegacySpec("order-record", "order-service",
    "ORDER_EVENT", "placedAt", tsIsEpochSeconds = false, Seq("orderId", "items", "placedAt"))
  val inventoryUpdate: LegacySpec = LegacySpec("inventory-update", "inventory-service",
    "INVENTORY_EVENT", "updateTime", tsIsEpochSeconds = true, Seq("sku", "qty", "updateTime"))
  val paymentNotice: LegacySpec = LegacySpec("payment-notice", "payment-gateway",
    "PAYMENT_EVENT", "time", tsIsEpochSeconds = false, Seq("txnId", "amount", "currency", "time"))
  val shipmentStatus: LegacySpec = LegacySpec("shipment-status", "shipping-service",
    "SHIPMENT_EVENT", "deliveredAt", tsIsEpochSeconds = true, Seq("shipId", "status", "deliveredAt"))

  val all: Seq[LegacySpec] =
    Seq(userProfile, orderRecord, inventoryUpdate, paymentNotice, shipmentStatus)

  /** JSON-escape a string that is spliced between double quotes in a
    * hand-assembled envelope: json_tuple/get_json_object UNESCAPE on
    * extraction, so a pass-through value containing `"` or `\` would
    * otherwise emit a malformed envelope that the splitter's
    * get_json_object silently nulls (the reference's Jackson re-escapes on
    * serialization). Control characters are not re-escaped — the upstream
    * validity checks never admit them into the pass-through fields. */
  private def jsonEscape(c: Column): Column =
    regexp_replace(c, "([\\\\\"])", "\\\\$1")

  /** The envelope timestamp for a given raw payload column. try_cast: a
    * non-numeric epoch field must poison the RECORD (ts.isNotNull check in
    * `ok`), never the job — ANSI-mode cast would throw. */
  private def tsColumn(value: Column, spec: LegacySpec): Column = {
    val raw = get_json_object(value, "$." + spec.tsField)
    if (spec.tsIsEpochSeconds)
      IsoTime.isoFromEpochSeconds(expr(
        s"try_cast(get_json_object(value, '$$.${spec.tsField}') AS BIGINT)"))
    else raw
  }

  /** Translate raw payloads (`value` string column) for one source.
    *
    * `eventId` is a random UUID in the reference (asserted only non-blank,
    * TranslatorsIntegrationTest.kt:226). `deterministicIds=true` derives it
    * as sha256(source|eventType|payload) instead so results are
    * oracle-checkable; the wire shape is identical.
    */
  def translate(raw: DataFrame, spec: LegacySpec,
                deterministicIds: Boolean = false): Translated = {
    val value = col("value")
    val required = spec.requiredFields
      .map(f => get_json_object(value, "$." + f).isNotNull)
      .reduce(_ && _)
    val ts = tsColumn(value, spec)
    val ok = required && ts.isNotNull
    val tagged = raw.withColumn("_ok", ok)
    val eventId =
      if (deterministicIds)
        sha2(concat_ws("|", lit(spec.source), lit(spec.eventType), value), 256)
      else expr("uuid()")
    val valid = tagged.filter(col("_ok")).drop("_ok")
      .withColumn("eventId", eventId)
      .withColumn("source", lit(spec.source))
      .withColumn("eventType", lit(spec.eventType))
      .withColumn("timestamp", ts)
      // `data` carries the ORIGINAL payload object verbatim, so the envelope
      // is assembled by splicing rather than re-serializing.
      .withColumn("event_json", concat(
        lit("{\"eventId\":\""), col("eventId"),
        lit("\",\"source\":\""), col("source"),
        lit("\",\"eventType\":\""), col("eventType"),
        lit("\",\"timestamp\":\""), jsonEscape(col("timestamp")),
        lit("\",\"data\":"), value, lit("}")))
    Translated(valid, tagged.filter(!col("_ok")).drop("_ok").select("value"))
  }

  /** Union of every source's payload field names: the mux parses each
    * message ONCE via the `json_tuple` generator. (A `from_json` struct is
    * the obvious alternative, but Catalyst's filter-pushdown substitutes the
    * struct alias into EVERY field reference, cloning the non-codegen parse
    * ~20× per row; a Generate node is not an alias and cannot be inlined.) */
  private val muxFields = Seq(
    "uid", "name", "created",
    "orderId", "items", "placedAt",
    "sku", "qty", "updateTime",
    "txnId", "amount", "currency", "time",
    "shipId", "status", "deliveredAt")

  private def tsFromFields(j: String => Column, spec: LegacySpec): Column =
    if (spec.tsIsEpochSeconds)
      // try_cast, not cast: ANSI mode throws on non-numeric poison input
      IsoTime.isoFromEpochSeconds(expr(s"try_cast(_j_${spec.tsField} AS BIGINT)"))
    else j(spec.tsField)

  /** All five translators multiplexed into ONE projection, selected per row
    * by `kindCol` (0..4 indexing [[all]]). Semantically identical to running
    * each translator on its own filtered slice and unioning, but the corpus
    * is scanned once instead of five times and each message is JSON-parsed
    * once instead of ~6× — at scale the five-scan union would quintuple
    * source IO for no reason. Always deterministic-id (the oracle-checkable
    * mode). */
  def translateMux(raw: DataFrame, kindCol: Column): Translated = {
    val value = col("value")
    val jcols = muxFields.map(f => s"_j_$f")
    val parsed = raw.select(col("*"),
      json_tuple(value, muxFields: _*).as(jcols))
    def j(f: String): Column = col(s"_j_$f")
    def perKind(f: LegacySpec => Column): Column =
      all.zipWithIndex.tail.foldLeft(when(kindCol === 0, f(all.head))) {
        case (acc, (spec, i)) => acc.when(kindCol === i, f(spec))
      }
    val ok = perKind { spec =>
      val required = spec.requiredFields.map(f => j(f).isNotNull).reduce(_ && _)
      required && tsFromFields(j, spec).isNotNull
    }
    val tagged = parsed.withColumn("_ok", coalesce(ok, lit(false)))
    val source = perKind(spec => lit(spec.source))
    val eventType = perKind(spec => lit(spec.eventType))
    val ts = perKind(spec => tsFromFields(j, spec))
    val valid = tagged.filter(col("_ok")).drop("_ok")
      .withColumn("source", source)
      .withColumn("eventType", eventType)
      .withColumn("timestamp", ts)
      .withColumn("eventId",
        sha2(concat_ws("|", col("source"), col("eventType"), value), 256))
      .withColumn("event_json", concat(
        lit("{\"eventId\":\""), col("eventId"),
        lit("\",\"source\":\""), col("source"),
        lit("\",\"eventType\":\""), col("eventType"),
        lit("\",\"timestamp\":\""), jsonEscape(col("timestamp")),
        lit("\",\"data\":"), value, lit("}")))
      .drop(jcols: _*)
    Translated(valid, tagged.filter(!col("_ok")).select("value"))
  }
}
