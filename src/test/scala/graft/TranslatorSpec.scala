package graft

import graft.translate.VehicleTranslators
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden scenarios for the three vehicle translators, ported from the
  * reference unit tests (GeotabTranslatorTest.kt:31–149,
  * CalAmpTranslatorTest.kt:31–115, FordTranslatorTest.kt:31–130): valid
  * input, missing optionals, malformed input, unknown enum, plus the
  * Jackson-strictness unknown-key rejection (SURVEY.md §0.2). */
class TranslatorSpec extends SparkSpec {

  // --- Geotab (GeotabTranslatorTest.kt) ---

  private val geotabValid =
    """{"Device_ID":"geo-device-123","Vehicle_ID":"vehicle-abc",""" +
    """"Record_DateTime":"2023-10-26T10:00:00.000Z","Latitude":34.0522,""" +
    """"Longitude":-118.2437,"Odometer_mi":12345.6,"EngineSpeed_rpm":2500.0,""" +
    """"Fuel_Level_pct":75.5,"Ignition_Status":"ON",""" +
    """"customGeotabField1":"customValue1","customGeotabField2":100}"""

  test("geotab: valid input produces correct CMF (golden: GeotabTranslatorTest.kt:31-84)") {
    val t = VehicleTranslators.geotab(strings(geotabValid), "test-tenant")
    assert(t.quarantine.count() === 0)
    val r = t.valid.select(
      col("cmf.vehicleId"), col("cmf.deviceId"), col("cmf.sourceType"),
      col("cmf.epochSource"), col("cmf.dateTime"), col("cmf.tenantId"),
      col("cmf.partitionKey"),
      col("cmf.telemetry.location.lat"), col("cmf.telemetry.location.lon"),
      col("cmf.telemetry.location.timestamp"),
      col("cmf.telemetry.odometerCanMi"), col("cmf.telemetry.engineRpm"),
      col("cmf.telemetry.fuelLevelPct"), col("cmf.telemetry.ignitionStatus"),
      col("cmf.sourceSpecificData"),
      col("cmf.meta.additionalProperties").getItem("translator")).head()
    assert(r === Row("vehicle-abc", "geo-device-123", "Geotab",
      1698314400000L, "2023-10-26T10:00:00Z", "test-tenant", "vehicle-abc",
      34.0522, -118.2437, "2023-10-26T10:00:00Z",
      12345.6, 2500.0, 75.5, "ON",
      """{"customGeotabField1":"customValue1","customGeotabField2":100}""",
      "GeotabTranslator_v1.0"))
  }

  test("geotab: missing optionals succeed with nulls and UNKNOWN ignition (ref :87-114)") {
    val in = """{"Device_ID":"geo-device-789","Vehicle_ID":"vehicle-xyz",""" +
      """"Record_DateTime":"2023-10-27T12:00:00.000Z","Latitude":35.0,"Longitude":-119.0}"""
    val t = VehicleTranslators.geotab(strings(in), "test-tenant")
    val r = t.valid.select(
      col("cmf.vehicleId"), col("cmf.telemetry.odometerCanMi"),
      col("cmf.telemetry.engineRpm"), col("cmf.telemetry.fuelLevelPct"),
      col("cmf.telemetry.ignitionStatus"), col("cmf.sourceSpecificData")).head()
    assert(r === Row("vehicle-xyz", null, null, null, "UNKNOWN", "{}"))
  }

  test("geotab: missing required fields quarantines the record (ref :116-123)") {
    val t = VehicleTranslators.geotab(strings("""{"Device_ID": "test"}"""), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 1)
  }

  test("geotab: unknown ignition status maps to UNKNOWN (ref :125-142)") {
    val in = """{"Device_ID":"d","Vehicle_ID":"v",""" +
      """"Record_DateTime":"2023-10-26T10:00:00.000Z","Latitude":1.0,""" +
      """"Longitude":2.0,"Ignition_Status":"AJAR"}"""
    val t = VehicleTranslators.geotab(strings(in), "t")
    assert(t.valid.select(col("cmf.telemetry.ignitionStatus")).head().getString(0)
      === "UNKNOWN")
  }

  test("geotab: null and malformed input quarantined, job survives (ref :144-149)") {
    val t = VehicleTranslators.geotab(
      strings(null, """{"Device_ID": "geo", truncated"""), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 2)
  }

  test("geotab: unknown top-level key rejects the record (Jackson FAIL_ON_UNKNOWN_PROPERTIES)") {
    val in = """{"Device_ID":"d","Vehicle_ID":"v",""" +
      """"Record_DateTime":"2023-10-26T10:00:00.000Z","Latitude":1.0,""" +
      """"Longitude":2.0,"Ignition":"true"}"""
    val t = VehicleTranslators.geotab(strings(in), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 1)
  }

  test("geotab: cmf_json wire form splices raw ssd and keeps null fields") {
    val t = VehicleTranslators.geotab(strings(geotabValid), "test-tenant")
    val r = t.valid.select(
      get_json_object(col("cmf_json"), "$.sourceSpecificData.customGeotabField2"),
      get_json_object(col("cmf_json"), "$.meta.additionalProperties.translator"),
      get_json_object(col("cmf_json"), "$.telemetry.ignitionStatus")).head()
    assert(r === Row("100", "GeotabTranslator_v1.0", "ON"))
    // Jackson serializes nulls explicitly: "events":null must be present
    assert(t.valid.select(col("cmf_json")).head().getString(0)
      .contains("\"events\":null"))
  }

  test("geotab: non-Z ISO offset input normalizes to canonical Z output (ISO_OFFSET_DATE_TIME parity)") {
    val in = """{"Device_ID":"d","Vehicle_ID":"v",""" +
      """"Record_DateTime":"2023-10-26T12:00:00+02:00","Latitude":1.0,"Longitude":2.0}"""
    val t = VehicleTranslators.geotab(strings(in), "t")
    val r = t.valid.select(col("cmf.epochSource"), col("cmf.dateTime")).head()
    // +02:00 noon == 10:00Z; output is always canonical UTC/Z
    assert(r === Row(1698314400000L, "2023-10-26T10:00:00Z"))
  }

  // --- CalAmp (CalAmpTranslatorTest.kt) ---

  test("calamp: valid input, epoch-seconds x1000 (golden: CalAmpTranslatorTest.kt:31-78)") {
    val secs = 1698827400L // 2023-11-01T08:30:00Z
    val in = s"""{"unit_id":"calamp-unit-001","vid":"calamp-vehicle-777",""" +
      s""""msg_ts":$secs,"gps_lat":36.1699,"gps_lon":-115.1398,""" +
      s""""speed_mph":65.5,"fuel_percent":45.0,"voltage":12.5,""" +
      s""""calAmpSpecificValue":"payload-data"}"""
    val t = VehicleTranslators.calAmp(strings(in), "calamp-tenant")
    val r = t.valid.select(
      col("cmf.vehicleId"), col("cmf.deviceId"), col("cmf.sourceType"),
      col("cmf.epochSource"), col("cmf.dateTime"), col("cmf.tenantId"),
      col("cmf.partitionKey"),
      col("cmf.telemetry.location.lat"), col("cmf.telemetry.location.lon"),
      col("cmf.telemetry.speedGpsMph"), col("cmf.telemetry.fuelLevelPct"),
      col("cmf.telemetry.batteryVoltage"), col("cmf.sourceSpecificData")).head()
    assert(r === Row("calamp-vehicle-777", "calamp-unit-001", "CalAmp",
      secs * 1000, "2023-11-01T08:30:00Z", "calamp-tenant", "calamp-vehicle-777",
      36.1699, -115.1398, 65.5, 45.0, 12.5,
      """{"calAmpSpecificValue":"payload-data"}"""))
  }

  test("calamp: missing optionals succeed; empty ssd (ref :80-107)") {
    val in = """{"unit_id":"u2","vid":"v8","msg_ts":1698919200,""" +
      """"gps_lat":37.0,"gps_lon":-116.0}"""
    val t = VehicleTranslators.calAmp(strings(in), "t")
    val r = t.valid.select(col("cmf.telemetry.speedGpsMph"),
      col("cmf.telemetry.fuelLevelPct"), col("cmf.telemetry.batteryVoltage"),
      col("cmf.sourceSpecificData")).head()
    assert(r === Row(null, null, null, "{}"))
  }

  test("calamp: missing required quarantines (ref :109-115)") {
    val t = VehicleTranslators.calAmp(strings("""{"unit_id": "test"}"""), "t")
    assert(t.valid.count() === 0 && t.quarantine.count() === 1)
  }

  test("calamp: null and malformed input quarantined, job survives (5-scenario parity)") {
    val t = VehicleTranslators.calAmp(strings(null, """{"unit_id": 12"""), "t")
    assert(t.valid.count() === 0 && t.quarantine.count() === 2)
  }

  test("calamp: unknown top-level key rejects the record (Jackson strictness)") {
    val in = """{"unit_id":"u","vid":"v","msg_ts":1698919200,""" +
      """"gps_lat":37.0,"gps_lon":-116.0,"surprise_field":1}"""
    val t = VehicleTranslators.calAmp(strings(in), "t")
    assert(t.valid.count() === 0 && t.quarantine.count() === 1)
  }

  // --- Ford (FordTranslatorTest.kt) ---

  test("ford: valid input, dual timestamps, rpm widened (golden: FordTranslatorTest.kt:31-85)") {
    val cap = 1701432000000L // 2023-12-01T12:00:00Z
    val loc = 1701431998000L // 2023-12-01T11:59:58Z
    val in = s"""{"vin":"ford-vin-111","esn":"ford-esn-222","captureTime":$cap,""" +
      s""""coords":{"latValue":40.7128,"lonValue":-74.0060,"ts":$loc},""" +
      s""""vehicleSpeed":70.2,"fuelRemainingGallons":10.5,"rpm":3000,""" +
      s""""fordExtraData":{"doorStatus":"all_closed","tirePressureStatus":"normal"}}"""
    val t = VehicleTranslators.ford(strings(in), "ford-tenant")
    val r = t.valid.select(
      col("cmf.vehicleId"), col("cmf.deviceId"), col("cmf.sourceType"),
      col("cmf.epochSource"), col("cmf.dateTime"), col("cmf.tenantId"),
      col("cmf.partitionKey"),
      col("cmf.telemetry.location.lat"), col("cmf.telemetry.location.lon"),
      col("cmf.telemetry.location.timestamp"),
      col("cmf.telemetry.speedGpsMph"), col("cmf.telemetry.fuelLevelGallon"),
      col("cmf.telemetry.engineRpm"),
      get_json_object(col("cmf.sourceSpecificData"), "$.doorStatus"),
      get_json_object(col("cmf.sourceSpecificData"), "$.tirePressureStatus")).head()
    assert(r === Row("ford-vin-111", "ford-esn-222", "Ford",
      cap, "2023-12-01T12:00:00Z", "ford-tenant", "ford-vin-111",
      40.7128, -74.0060, "2023-12-01T11:59:58Z",
      70.2, 10.5, 3000.0, "all_closed", "normal"))
  }

  test("ford: missing optionals succeed; ssd defaults to {} (ref :87-120)") {
    val in = """{"vin":"ford-vin-333","esn":"ford-esn-444",""" +
      """"captureTime":1701527400000,""" +
      """"coords":{"latValue":41.0,"lonValue":-75.0,"ts":1701527395000}}"""
    val t = VehicleTranslators.ford(strings(in), "t")
    val r = t.valid.select(col("cmf.telemetry.speedGpsMph"),
      col("cmf.telemetry.fuelLevelGallon"), col("cmf.telemetry.engineRpm"),
      col("cmf.sourceSpecificData")).head()
    assert(r === Row(null, null, null, "{}"))
  }

  test("ford: missing required (coords) quarantines (ref :122-129)") {
    val t = VehicleTranslators.ford(strings("""{"vin": "test"}"""), "t")
    assert(t.valid.count() === 0 && t.quarantine.count() === 1)
  }

  test("ford: null and malformed input quarantined, job survives (5-scenario parity)") {
    val t = VehicleTranslators.ford(strings(null, """{"vin": "trunc"""), "t")
    assert(t.valid.count() === 0 && t.quarantine.count() === 2)
  }

  test("ford: unknown top-level key rejects the record (Jackson strictness)") {
    val in = """{"vin":"v","esn":"e","captureTime":1701432000000,""" +
      """"coords":{"latValue":1.0,"lonValue":2.0,"ts":1701431999000},"mystery":true}"""
    val t = VehicleTranslators.ford(strings(in), "t")
    assert(t.valid.count() === 0 && t.quarantine.count() === 1)
  }

  test("ford: fractional-second epoch renders millisecond ISO text") {
    val in = """{"vin":"v","esn":"e","captureTime":1701432000123,""" +
      """"coords":{"latValue":1.0,"lonValue":2.0,"ts":1701432000120}}"""
    val t = VehicleTranslators.ford(strings(in), "t")
    val r = t.valid.select(col("cmf.dateTime"),
      col("cmf.telemetry.location.timestamp")).head()
    assert(r === Row("2023-12-01T12:00:00.123Z", "2023-12-01T12:00:00.120Z"))
  }

  // --- ANSI-mode poison hardening (records quarantine, job never dies) ---

  test("geotab: non-numeric OPTIONAL field poisons the record (Jackson InvalidFormatException parity)") {
    val broken = geotabValid.replace("12345.6", "\"broken\"")
    val t = VehicleTranslators.geotab(strings(broken), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 1)
  }

  test("geotab: bare date / space-separated datetime rejected like Instant.parse") {
    val dateOnly = geotabValid.replace("2023-10-26T10:00:00.000Z", "2023-10-26")
    val spaced = geotabValid.replace("2023-10-26T10:00:00.000Z", "2023-10-26 10:00:00")
    val t = VehicleTranslators.geotab(strings(dateOnly, spaced), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 2)
  }

  test("calamp: msg_ts that overflows x1000 is quarantined, not a job crash (ANSI)") {
    val huge =
      """{"unit_id":"c","vid":"v","msg_ts":9223372036854775807,""" +
      """"gps_lat":1.0,"gps_lon":2.0}"""
    val t = VehicleTranslators.calAmp(strings(huge), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 1)
  }

  test("calamp: epoch whose x1000 fits a long but overflows timestamp_millis quarantines, no job crash") {
    // msg_ts = 1e13 s: x1000 = 1e16 ms passes try_multiply (< Long.Max)
    // but timestamp_millis's millis->micros conversion would overflow —
    // previously an ArithmeticException that killed the whole job
    val absurd =
      """{"unit_id":"c","vid":"v","msg_ts":10000000000000,""" +
      """"gps_lat":1.0,"gps_lon":2.0}"""
    val t = VehicleTranslators.calAmp(strings(absurd), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 1)
  }

  test("geotab: seconds-bearing UTC offset parses like Instant.parse") {
    val offs =
      """{"Device_ID":"d","Vehicle_ID":"v",""" +
      """"Record_DateTime":"2023-01-01T00:00:00+05:30:15","Latitude":1.0,""" +
      """"Longitude":2.0}"""
    val t = VehicleTranslators.geotab(strings(offs), "t")
    assert(t.valid.count() === 1, "Instant.parse accepts +HH:MM:SS offsets")
    // epoch matches java.time.Instant.parse
    val es = t.valid.select(col("cmf.epochSource")).head().getLong(0)
    assert(es === java.time.Instant.parse("2023-01-01T00:00:00+05:30:15").toEpochMilli)
  }

  test("ford: unknown key nested in coords quarantines (nested Jackson strictness)") {
    val nested =
      """{"vin":"v","esn":"e","captureTime":1698314400000,""" +
      """"coords":{"latValue":1.0,"lonValue":2.0,"ts":1698314395000,"altitude":5}}"""
    val t = VehicleTranslators.ford(strings(nested), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 1)
  }

  test("ford: scalar fordExtraData (not an object) poisons the record") {
    val scalar =
      """{"vin":"v","esn":"e","captureTime":1698314400000,""" +
      """"coords":{"latValue":1.0,"lonValue":2.0,"ts":1698314395000},""" +
      """"fordExtraData":5}"""
    val t = VehicleTranslators.ford(strings(scalar), "t")
    assert(t.valid.count() === 0)
    assert(t.quarantine.count() === 1)
  }
}
