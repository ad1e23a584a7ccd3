package graft.translate

import graft.model.Cmf
import graft.time.IsoTime
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A translator's output: the happy path and the poison path.
  *
  * The reference drops poison records with a log line
  * (GeotabTranslator.kt:154–157 returns null on any parse/validation error);
  * we return them as a first-class quarantine DataFrame instead — same
  * observable happy path, auditable error path (SURVEY.md §2.3 R4).
  */
final case class Translated(valid: DataFrame, quarantine: DataFrame)

/** The three per-source → CMF translators, re-expressed as pure Catalyst
  * expression pipelines (`from_json` + `select`) instead of per-record
  * functions. No UDFs, no mapPartitions: each translator is one narrow
  * projection that whole-stage-codegen fuses with the surrounding plan, so at
  * 100 TB it runs scan-speed with zero shuffles.
  *
  * Semantics cloned from the reference (file:line cited per rule below):
  *  - GeotabTranslator.kt:91–158  (ISO input, enum decode, custom fields)
  *  - CalAmpTranslator.kt:83–141  (epoch-seconds×1000)
  *  - FordTranslator.kt:99–156    (epoch-ms, nested coords, rpm Int→Double)
  *
  * Error contract (all three): Jackson with Kotlin data classes fails the
  * whole record on (a) malformed JSON, (b) missing required constructor args,
  * (c) unknown top-level fields (`FAIL_ON_UNKNOWN_PROPERTIES` default) — the
  * record is dropped, never the job. We reproduce (a) via PERMISSIVE
  * `from_json` null-out, (b) via required-field predicates, (c) via a
  * `json_object_keys` ⊆ allowed-keys check.
  */
object VehicleTranslators {

  /** GeotabInputMessage (GeotabTranslator.kt:34–47). */
  val geotabInputSchema: StructType = StructType(Seq(
    StructField("Device_ID", StringType),
    StructField("Vehicle_ID", StringType),
    StructField("Record_DateTime", StringType),
    StructField("Latitude", DoubleType),
    StructField("Longitude", DoubleType),
    StructField("Odometer_mi", DoubleType),
    StructField("EngineSpeed_rpm", DoubleType),
    StructField("Fuel_Level_pct", DoubleType),
    StructField("Ignition_Status", StringType),
    StructField("customGeotabField1", StringType),
    StructField("customGeotabField2", IntegerType)
  ))

  /** CalAmpInputMessage (CalAmpTranslator.kt:31–42). */
  val calAmpInputSchema: StructType = StructType(Seq(
    StructField("unit_id", StringType),
    StructField("vid", StringType),
    StructField("msg_ts", LongType),
    StructField("gps_lat", DoubleType),
    StructField("gps_lon", DoubleType),
    StructField("speed_mph", DoubleType),
    StructField("fuel_percent", DoubleType),
    StructField("voltage", DoubleType),
    StructField("calAmpSpecificValue", StringType)
  ))

  /** FordInputMessage + FordCoordinates (FordTranslator.kt:30–52). The open
    * `fordExtraData: Map<String,Any>` is re-extracted as raw JSON text. */
  val fordInputSchema: StructType = StructType(Seq(
    StructField("vin", StringType),
    StructField("esn", StringType),
    StructField("captureTime", LongType),
    StructField("coords", StructType(Seq(
      StructField("latValue", DoubleType),
      StructField("lonValue", DoubleType),
      StructField("ts", LongType)
    ))),
    StructField("vehicleSpeed", DoubleType),
    StructField("fuelRemainingGallons", DoubleType),
    StructField("rpm", IntegerType)
  ))

  private val fordAllKeys = Seq("vin", "esn", "captureTime", "coords",
    "vehicleSpeed", "fuelRemainingGallons", "rpm", "fordExtraData")

  /** Jackson-parity strictness: a syntactically valid JSON object with a
    * top-level key outside the input data class is rejected
    * (FAIL_ON_UNKNOWN_PROPERTIES — load_test.py:32–42 relies on this to
    * poison the Geotab path). `json_object_keys` is null on non-objects;
    * those are caught by the malformed check already. */
  private def hasUnknownKeys(valueCol: Column, allowed: Seq[String]): Column = {
    val keys = call_function("json_object_keys", valueCol)
    coalesce(size(array_except(keys, array(allowed.map(lit): _*))) > 0, lit(false))
  }

  private def splitValid(df: DataFrame, okCol: Column): Translated = {
    val tagged = df.withColumn("_ok", okCol)
    Translated(
      valid = tagged.filter(col("_ok")).drop("_ok"),
      quarantine = tagged.filter(!col("_ok")).drop("_ok").select("value"))
  }

  /** Geotab raw JSON → CMF. Input DataFrame needs a `value` StringType column
    * (one message per row). `tenant` plays the role of `context.tenant`
    * (GeotabTranslator.kt:141). */
  def geotab(raw: DataFrame, tenant: String): Translated = {
    val parsed = raw.withColumn("_in", from_json(col("value"), geotabInputSchema,
      Map("mode" -> "PERMISSIVE")))
    val in = col("_in")
    val epochSource = IsoTime.epochMillisFromIso(in("Record_DateTime"))
    val ok = in.isNotNull &&
      in("Device_ID").isNotNull && in("Vehicle_ID").isNotNull &&
      in("Record_DateTime").isNotNull && epochSource.isNotNull &&
      in("Latitude").isNotNull && in("Longitude").isNotNull &&
      !hasUnknownKeys(col("value"), geotabInputSchema.fieldNames.toSeq)

    val split = splitValid(parsed, ok)
    val dateTime = IsoTime.isoFromEpochMillis(epochSource)
    val telemetry = Cmf.telemetryStruct(Map(
      "location" -> struct(dateTime.as("timestamp"), in("Longitude").as("lon"),
        in("Latitude").as("lat")),
      "odometerCanMi" -> in("Odometer_mi"),
      "engineRpm" -> in("EngineSpeed_rpm"),
      "fuelLevelPct" -> in("Fuel_Level_pct"),
      "ignitionStatus" -> Cmf.enumNormalize(in("Ignition_Status"), Seq("ON", "OFF"))
    ))
    // filterValues { it != null } (GeotabTranslator.kt:130–133) ≡ to_json's
    // default null-field dropping.
    val ssd = to_json(struct(
      in("customGeotabField1").as("customGeotabField1"),
      in("customGeotabField2").as("customGeotabField2")))
    val cmf = Cmf.envelope(dateTime, epochSource, in("Vehicle_ID"), in("Device_ID"),
      lit(tenant), lit("Geotab"), in("Vehicle_ID"), telemetry, ssd,
      Map("translator" -> lit("GeotabTranslator_v1.0")))
    split.copy(valid = split.valid.withColumn("cmf", cmf)
      .withColumn("cmf_json", CmfJson.wire(col("cmf"))).drop("_in"))
  }

  /** CalAmp raw JSON → CMF. `msg_ts` is epoch SECONDS; epochSource is
    * seconds×1000 (CalAmpTranslator.kt:100). */
  def calAmp(raw: DataFrame, tenant: String): Translated = {
    val parsed = raw.withColumn("_in", from_json(col("value"), calAmpInputSchema,
      Map("mode" -> "PERMISSIVE")))
    val in = col("_in")
    val ok = in.isNotNull &&
      in("unit_id").isNotNull && in("vid").isNotNull && in("msg_ts").isNotNull &&
      in("gps_lat").isNotNull && in("gps_lon").isNotNull &&
      !hasUnknownKeys(col("value"), calAmpInputSchema.fieldNames.toSeq)

    val split = splitValid(parsed, ok)
    val epochSource = in("msg_ts") * 1000L
    val dateTime = IsoTime.isoFromEpochMillis(epochSource)
    val telemetry = Cmf.telemetryStruct(Map(
      "location" -> struct(dateTime.as("timestamp"), in("gps_lon").as("lon"),
        in("gps_lat").as("lat")),
      "speedGpsMph" -> in("speed_mph"),
      "fuelLevelPct" -> in("fuel_percent"),
      "batteryVoltage" -> in("voltage")
    ))
    val ssd = to_json(struct(in("calAmpSpecificValue").as("calAmpSpecificValue")))
    val cmf = Cmf.envelope(dateTime, epochSource, in("vid"), in("unit_id"),
      lit(tenant), lit("CalAmp"), in("vid"), telemetry, ssd,
      Map("translator" -> lit("CalAmpTranslator_v1.0")))
    split.copy(valid = split.valid.withColumn("cmf", cmf)
      .withColumn("cmf_json", CmfJson.wire(col("cmf"))).drop("_in"))
  }

  /** Ford raw JSON → CMF. Two independent timestamps: envelope from
    * `captureTime`, location from `coords.ts` (FordTranslator.kt:116–117);
    * `rpm` Int widened to Double (:127); `fordExtraData` forwarded verbatim,
    * `{}` when absent (:131). */
  def ford(raw: DataFrame, tenant: String): Translated = {
    val parsed = raw.withColumn("_in", from_json(col("value"), fordInputSchema,
      Map("mode" -> "PERMISSIVE")))
    val in = col("_in")
    val coords = in("coords")
    val ok = in.isNotNull &&
      in("vin").isNotNull && in("esn").isNotNull && in("captureTime").isNotNull &&
      coords.isNotNull && coords("latValue").isNotNull &&
      coords("lonValue").isNotNull && coords("ts").isNotNull &&
      !hasUnknownKeys(col("value"), fordAllKeys)

    val split = splitValid(parsed, ok)
    val dateTime = IsoTime.isoFromEpochMillis(in("captureTime"))
    val locTime = IsoTime.isoFromEpochMillis(coords("ts"))
    val telemetry = Cmf.telemetryStruct(Map(
      "location" -> struct(locTime.as("timestamp"), coords("lonValue").as("lon"),
        coords("latValue").as("lat")),
      "speedGpsMph" -> in("vehicleSpeed"),
      "fuelLevelGallon" -> in("fuelRemainingGallons"),
      "engineRpm" -> in("rpm").cast(DoubleType)
    ))
    val ssd = coalesce(get_json_object(col("value"), "$.fordExtraData"), lit("{}"))
    val cmf = Cmf.envelope(dateTime, in("captureTime"), in("vin"), in("esn"),
      lit(tenant), lit("Ford"), in("vin"), telemetry, ssd,
      Map("translator" -> lit("FordTranslator_v1.0")))
    split.copy(valid = split.valid.withColumn("cmf", cmf)
      .withColumn("cmf_json", CmfJson.wire(col("cmf"))).drop("_in"))
  }
}

/** CMF wire-format serialization. Jackson serializes the Kotlin data classes
  * with nulls included and fields in declaration order; `sourceSpecificData`
  * is a raw JSON object, which `to_json` would re-escape as a string — so the
  * envelope is serialized in two parts and the payload spliced in verbatim. */
object CmfJson {
  def wire(cmf: Column): Column = {
    val head = to_json(struct(
      cmf("dateTime").as("dateTime"),
      cmf("epochSource").as("epochSource"),
      cmf("vehicleId").as("vehicleId"),
      cmf("deviceId").as("deviceId"),
      cmf("tenantId").as("tenantId"),
      cmf("sourceType").as("sourceType"),
      cmf("partitionKey").as("partitionKey"),
      cmf("telemetry").as("telemetry"),
      cmf("events").as("events")
    ), Map("ignoreNullFields" -> "false"))
    val meta = to_json(cmf("meta"), Map("ignoreNullFields" -> "false"))
    concat(
      substring_trailer_drop(head),
      lit(",\"sourceSpecificData\":"), cmf("sourceSpecificData"),
      lit(",\"meta\":"), coalesce(meta, lit("null")),
      lit("}"))
  }

  /** `head` minus its trailing `}` so more members can be appended. */
  private def substring_trailer_drop(c: Column): Column =
    c.substr(lit(1), length(c) - 1)
}
