package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Source-topology parity with the reference's seven connectors
  * (pipeline.yaml:4–39, SURVEY.md §2.1 S1–S7): one definition per connector,
  * carrying the reference's tuning knobs, that resolves to a streaming (or
  * batch) DataFrame of raw `value` strings feeding its `outputTopic`.
  *
  * Resolution strategy mirrors the Spark mapping in SURVEY.md §2.1:
  *  - kafka-protocol sources (Kafka S2, Event Hub S4) → `format("kafka")`
  *  - Kinesis S1 → `format("kinesis")` where the connector jar exists
  *  - RabbitMQ S3 / HTTP S5 / gRPC S6 → no first-party Spark source: a tiny
  *    receiver bridges into a spool directory consumed through the
  *    [[SpoolDataSource]] DataSourceV2 (`graft-spool` — a real
  *    TableProvider with BATCH_READ + MICRO_BATCH_READ, filename-watermark
  *    offsets)
  *  - Pulsar S7 → `format("pulsar")`
  * This zero-egress harness has none of the broker connector jars, so the
  * CLUSTER formats (kafka/kinesis/pulsar) resolve through the built-in
  * text file stream over the same spool layout — the topology (source →
  * raw topic → translator → CMF → router) is what's under test, and it is
  * identical whichever physical resolver backs a topic. The format mapping
  * is data ([[SourceDef.sparkFormat]]): bridged sources exercise the V2
  * seam offline, and a jar-equipped deployment switches per source.
  */
sealed trait SourceDef {
  /** Connector instance name (pipeline.yaml key). */
  def name: String
  /** The raw-* topic this source feeds (pipeline.yaml `output`). */
  def outputTopic: String
  /** The Spark streaming format a jar-equipped cluster would use. */
  def sparkFormat: String

  private val valueSchema = StructType(Seq(StructField("value", StringType)))

  /** Streaming resolution: one row per message, column `value` (the
    * reference's Schema.STRING wire contract, Filterer.kt:39). Offline the
    * topic is a spool directory of text files under `baseDir`; bridged
    * sources consume it through the graft-spool MicroBatchStream, cluster
    * formats through the built-in file stream. */
  def stream(spark: SparkSession, baseDir: String): DataFrame =
    if (sparkFormat == SpoolDataSource.NAME)
      spark.readStream.format(SpoolDataSource.NAME).load(s"$baseDir/$outputTopic")
    else
      spark.readStream.schema(valueSchema).text(s"$baseDir/$outputTopic")

  /** Batch resolution over the same spool layout (replay/backfill path). */
  def batch(spark: SparkSession, baseDir: String): DataFrame =
    if (sparkFormat == SpoolDataSource.NAME)
      spark.read.format(SpoolDataSource.NAME).load(s"$baseDir/$outputTopic")
    else
      spark.read.schema(valueSchema).text(s"$baseDir/$outputTopic")
}

/** S1 — AWS Kinesis (connectors/kinesis/config.sample.yml:21–26). */
final case class KinesisSource(
    name: String,
    streamName: String,
    initialPosition: String = "TRIM_HORIZON",
    checkpointIntervalMs: Long = 60000,
    backoffTimeMs: Long = 3000,
    numRetries: Int = 3,
    receiveQueueSize: Int = 1000,
    outputTopic: String) extends SourceDef {
  val sparkFormat = "kinesis"
}

/** S2 — Kafka (connectors/kafka/config.sample.yml:8–16). */
final case class KafkaSource(
    name: String,
    bootstrapServers: String,
    topic: String,
    groupId: String,
    autoCommitEnabled: Boolean = false,
    outputTopic: String) extends SourceDef {
  val sparkFormat = "kafka"
}

/** S3 — RabbitMQ (connectors/rabbitmq/config.sample.yml:8–21); bridged. */
final case class RabbitMqSource(
    name: String,
    host: String,
    queueName: String,
    prefetchCount: Int = 0,
    requestedHeartbeat: Int = 60,
    outputTopic: String) extends SourceDef {
  val sparkFormat = SpoolDataSource.NAME // receiver → spool → graft-spool V2
}

/** S4 — Azure Event Hub via its Kafka-protocol head
  * (connectors/azure-eventhub/connector.yaml — `connectorType: kafka`). */
final case class EventHubSource(
    name: String,
    bootstrapServers: String,
    topic: String,
    groupId: String,
    outputTopic: String) extends SourceDef {
  val sparkFormat = "kafka"
}

/** S5 — HTTP/Netty listener (connectors/http/config.http.yml:10–12); bridged. */
final case class HttpSource(
    name: String,
    host: String = "0.0.0.0",
    port: Int = 10999,
    outputTopic: String) extends SourceDef {
  val sparkFormat = SpoolDataSource.NAME
}

/** S6 — gRPC (connectors/grpc/config.sample.yml:1–5 — config-only in the
  * reference too: "source code seems to be missing", connector.yaml:3). */
final case class GrpcSource(
    name: String,
    grpcEndpoint: String,
    outputTopic: String) extends SourceDef {
  val sparkFormat = SpoolDataSource.NAME
}

/** S7 — Pulsar→Pulsar passthrough (pipeline.yaml:35–39; no directory in the
  * reference tree, settings.gradle.kts:36–41). */
final case class PulsarSource(
    name: String,
    serviceUrl: String,
    inputTopic: String,
    outputTopic: String) extends SourceDef {
  val sparkFormat = "pulsar"
}

/** The pipeline.yaml:4–39 instances, verbatim configs. */
object Sources {
  val kinesisInput: KinesisSource = KinesisSource("kinesis-input",
    streamName = "my-kinesis-stream", outputTopic = "raw-kinesis-events")
  val kafkaInput: KafkaSource = KafkaSource("kafka-input",
    bootstrapServers = "kafka:9092", topic = "my-kafka-topic",
    groupId = "example-group", outputTopic = "raw-kafka-events")
  val eventHubInput: EventHubSource = EventHubSource("azure-eventhub-input",
    bootstrapServers = "localhost:9092", topic = "my-kafka-topic",
    groupId = "example-group", outputTopic = "raw-azure-events")
  val rabbitMqInput: RabbitMqSource = RabbitMqSource("rabbitmq-input",
    host = "rabbitmq", queueName = "my-queue", outputTopic = "raw-rabbitmq-events")
  val httpInput: HttpSource = HttpSource("http-input",
    outputTopic = "raw-http-events")
  val grpcInput: GrpcSource = GrpcSource("grpc-input",
    grpcEndpoint = "localhost:50051", outputTopic = "raw-grpc-events")
  val pulsarInput: PulsarSource = PulsarSource("pulsar-source-input",
    serviceUrl = "pulsar://localhost:6650", inputTopic = "upstream-topic",
    outputTopic = "raw-pulsar-events")

  val all: Seq[SourceDef] = Seq(kinesisInput, kafkaInput, eventHubInput,
    rabbitMqInput, httpInput, grpcInput, pulsarInput)
}
