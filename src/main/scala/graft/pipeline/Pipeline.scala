package graft.pipeline

import graft.route.{EventTypeSplitter, Filterer, Routed}
import graft.sources.{SourceDef, Sources}
import graft.translate.{LegacyTranslators, Translated, VehicleTranslators}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The deployment/pipeline.yaml:41–68 dataflow as code: each translator
  * function is bound to the source topic it consumes, all translators feed
  * the shared CMF topic, and the Filterer fans the CMF topic out by tenant.
  *
  *  - E1 (SURVEY.md §3): Kinesis → GeotabTranslator → CMF → Filterer
  *  - E2: HTTP → FordTranslator → CMF → Filterer (Kafka → CalAmp same shape)
  *  - E3: Kafka → legacy translators → common-events → EventTypeSplitter
  *
  * Bindings are data, so rewiring an input (pipeline.yaml "Example input"
  * comments) is a config change. Batch and streaming entry points share the
  * bindings — the transforms are identical; only the source resolution
  * (spark.read vs readStream) differs.
  */
object Pipeline {

  /** One pipeline.yaml `functions:` entry: source topic → translator. */
  final case class TranslatorBinding(
      functionName: String,
      source: SourceDef,
      translate: (DataFrame, String) => Translated)

  /** pipeline.yaml:42–61 — the three vehicle translator functions. */
  val vehicleBindings: Seq[TranslatorBinding] = Seq(
    TranslatorBinding("geotab-translator", Sources.kinesisInput,
      VehicleTranslators.geotab),
    TranslatorBinding("calamp-translator", Sources.kafkaInput,
      VehicleTranslators.calAmp),
    TranslatorBinding("ford-translator", Sources.httpInput,
      VehicleTranslators.ford))

  /** The shared CMF topic (pipeline.yaml:47,54,61): every translator's valid
    * output as wire-form strings, unioned — the one genuine set operation in
    * the reference (SURVEY.md §2.3 R3). Returns (cmf topic frame, unioned
    * quarantine). */
  def vehicleCmfBatch(spark: SparkSession, baseDir: String,
                      tenant: String = "acme"): Translated =
    vehicleCmf(b => b.source.batch(spark, baseDir), tenant)

  /** Streaming form of [[vehicleCmfBatch]] over the same spool layout. */
  def vehicleCmfStream(spark: SparkSession, baseDir: String,
                       tenant: String = "acme"): Translated =
    vehicleCmf(b => b.source.stream(spark, baseDir), tenant)

  /** The shared translate→union shape; only source resolution differs
    * between batch and streaming, so it is the only injected piece. */
  private def vehicleCmf(resolve: TranslatorBinding => DataFrame,
                         tenant: String): Translated = {
    val parts = vehicleBindings.map(b => (b, b.translate(resolve(b), tenant)))
    Translated(
      valid = parts.map(_._2.valid.select(col("cmf_json").as("value")))
        .reduce(_ unionByName _),
      // tag each quarantine slice with its translator BEFORE the union —
      // a caller holding only the combined frame can still tell a poisoned
      // Geotab record from a poisoned Ford one (per-source dead-letter
      // replay needs provenance; one post-union tag can't recover it)
      quarantine = parts
        .map { case (b, t) =>
          t.quarantine.withColumn("source", lit(b.functionName)) }
        .reduce(_ unionByName _))
  }

  /** E1/E2 tail (pipeline.yaml:63–68): CMF topic → Filterer → dynamic
    * per-tenant destinations. Works on batch or streaming frames. */
  def routeCmf(cmfTopic: DataFrame): Routed = Filterer.route(cmfTopic)

  /** E3: legacy business events (bootstrap.sh:107–171) — raw payloads with a
    * `kind` column → one multiplexed translate pass → EventTypeSplitter on
    * the wire envelopes. */
  def legacyEvents(raw: DataFrame): (Translated, Routed) = {
    val t = LegacyTranslators.translateMux(raw, col("kind"))
    (t, EventTypeSplitter.route(t.valid.select(col("event_json").as("value"))))
  }

  /** The COMPLETE E1/E2 dataflow as continuously-running streaming jobs —
    * the reference's deployed shape (pipeline.yaml:41–68 end to end):
    * spool sources → three translators → CMF union → Filterer → dynamic
    * per-tenant topic publish (graft-spool streaming sink; swap the format
    * for "kafka" on a live bus), plus a dead-letter sink capturing every
    * translator's quarantine AND the Filterer's unroutable drops, tagged
    * by origin for per-source replay (SURVEY.md §2.3 R4).
    *
    * Two streaming queries, each with its own checkpoint: the publish
    * path and the dead-letter path re-read the cheap spool source rather
    * than sharing a plan — streaming DataFrames cannot fork into two
    * sinks inside one query, and an always-on pipeline wants the failure
    * domains separate anyway (a dead-letter sink outage must not stop
    * tenant delivery). Returns (publish, deadLetter) handles; the caller
    * owns their lifecycle. */
  def runVehicleTopology(spark: SparkSession, spoolBase: String,
                         busRoot: String, deadLetterDir: String,
                         checkpointRoot: String, tenant: String = "acme")
      : (org.apache.spark.sql.streaming.StreamingQuery,
         org.apache.spark.sql.streaming.StreamingQuery) = {
    val publish = Filterer.route(
      vehicleCmfStream(spark, spoolBase, tenant).valid)
      .routed.select("topic", "value")
      .writeStream.format("graft-spool")
      .option("topics", "true").option("path", busRoot)
      .option("checkpointLocation", s"$checkpointRoot/publish")
      .outputMode("append").start()
    val cmf2 = vehicleCmfStream(spark, spoolBase, tenant)
    val deadLetter = cmf2.quarantine
      .unionByName(Filterer.route(cmf2.valid).dropped
        .withColumn("source", lit("filterer")))
      .writeStream.format("parquet").partitionBy("source")
      .option("path", deadLetterDir)
      .option("checkpointLocation", s"$checkpointRoot/dead-letter")
      .outputMode("append").start()
    (publish, deadLetter)
  }
}
