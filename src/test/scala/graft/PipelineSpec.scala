package graft

import graft.pipeline.Pipeline
import graft.route.Filterer
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** End-to-end topology wiring over the SourceDef spool layout: E1/E2
  * (vehicle sources → CMF → Filterer) and E3 (legacy → splitter), batch and
  * streaming resolution of the same sources. */
class PipelineSpec extends SparkSpec {

  private def writeSpool(baseDir: String, topic: String, lines: Seq[String]): Unit = {
    val dir = java.nio.file.Paths.get(baseDir, topic)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("part-0.txt"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
  }

  private def spoolDir(): String = {
    val base = java.nio.file.Files.createTempDirectory("spool").toString
    writeSpool(base, Sources.kinesisInput.outputTopic, Seq(
      """{"Device_ID":"g1","Vehicle_ID":"v1","Record_DateTime":"2023-10-26T10:00:00Z","Latitude":1.0,"Longitude":2.0}""",
      """{"Device_ID":"broken"""))
    writeSpool(base, Sources.kafkaInput.outputTopic, Seq(
      """{"unit_id":"c1","vid":"v2","msg_ts":1698314400,"gps_lat":3.0,"gps_lon":4.0}"""))
    writeSpool(base, Sources.httpInput.outputTopic, Seq(
      """{"vin":"v3","esn":"e3","captureTime":1698314400000,"coords":{"latValue":5.0,"lonValue":6.0,"ts":1698314395000}}"""))
    base
  }

  test("S1-S7: every connector from pipeline.yaml is defined with its output topic") {
    val topics = Sources.all.map(s => s.name -> s.outputTopic).toMap
    assert(topics === Map(
      "kinesis-input" -> "raw-kinesis-events",
      "kafka-input" -> "raw-kafka-events",
      "azure-eventhub-input" -> "raw-azure-events",
      "rabbitmq-input" -> "raw-rabbitmq-events",
      "http-input" -> "raw-http-events",
      "grpc-input" -> "raw-grpc-events",
      "pulsar-source-input" -> "raw-pulsar-events"))
    // kafka-protocol heads resolve to the built-in kafka source on a cluster
    assert(Sources.kafkaInput.sparkFormat === "kafka")
    assert(Sources.eventHubInput.sparkFormat === "kafka")
  }

  test("E1/E2 batch: three sources -> CMF topic union; poison quarantined per source") {
    val base = spoolDir()
    val cmf = Pipeline.vehicleCmfBatch(spark, base)
    assert(cmf.valid.count() === 3)
    assert(cmf.quarantine.count() === 1)
    val sources = cmf.valid
      .select(get_json_object(col("value"), "$.sourceType")).collect()
      .map(_.getString(0)).sorted
    assert(sources === Array("CalAmp", "Ford", "Geotab"))
  }

  test("E1/E2 streaming: same spool through readStream == batch output") {
    val base = spoolDir()
    val batchRows = Pipeline.vehicleCmfBatch(spark, base).valid
      .collect().map(_.getString(0)).sorted
    val q = Pipeline.vehicleCmfStream(spark, base).valid
      .writeStream.format("memory").queryName("pipe_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamRows = spark.table("pipe_stream").collect().map(_.getString(0)).sorted
    assert(streamRows === batchRows)
  }

  test("E1 tail: routable CMF fans out by meta.tenantId (FiltererIntegrationTest analogue)") {
    // the reference's own translators omit meta.tenantId (SURVEY.md §0.2) —
    // the routable wire contract comes from the integration tests' payloads
    val routable = (0 until 4).map(i =>
      s"""{"meta":{"tenantId":"t-${i % 2}"},"vehicleId":"veh-$i"}""")
    val r = Pipeline.routeCmf(strings(routable :+ """{"meta":{}}""": _*))
    assert(r.routed.count() === 4)
    assert(r.dropped.count() === 1)
    val out = java.nio.file.Files.createTempDirectory("tenants").toString
    Filterer.fanOutParquet(r.routed, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("tenantId=t-0", "tenantId=t-1"))
  }

  test("graft-spool V2: bridged sources resolve through the custom TableProvider") {
    val base = spoolDir()
    // batch plan is a DSv2 BatchScan over our table, not the text file source
    val plan = Sources.httpInput.batch(spark, base)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan graft-spool"), s"expected V2 scan, got:\n$plan")
    // and it reads the same rows the built-in text source would
    val viaV2 = Sources.httpInput.batch(spark, base)
      .collect().map(_.getString(0)).sorted
    val viaText = spark.read.text(s"$base/${Sources.httpInput.outputTopic}")
      .collect().map(_.getString(0)).sorted
    assert(viaV2 === viaText)
  }

  test("graft-spool V2: micro-batches advance on new spool files (watermark offsets)") {
    val base = java.nio.file.Files.createTempDirectory("spool_v2").toString
    val topic = Sources.rabbitMqInput.outputTopic
    writeSpool(base, topic, Seq("m1", "m2"))
    val q = Sources.rabbitMqInput.stream(spark, base)
      .writeStream.format("memory").queryName("spool_v2_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("spool_v2_stream").count() === 2)
      // second file arrives after the first batch committed: the filename
      // watermark must pick up exactly the new file
      val dir = java.nio.file.Paths.get(base, topic)
      java.nio.file.Files.write(dir.resolve("part-1.txt"), "m3\nm4\nm5".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = spark.table("spool_v2_stream").collect().map(_.getString(0)).sorted
      assert(rows === Array("m1", "m2", "m3", "m4", "m5"))
    } finally q.stop()
  }

  test("graft-spool V2: latestOffset is monotone under a transient empty listing") {
    val dir = java.nio.file.Files.createTempDirectory("spool_mono")
    java.nio.file.Files.write(dir.resolve("part-0001.txt"), "a".getBytes("UTF-8"))
    val stream = new graft.sources.SpoolMicroBatchStream(dir.toString,
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val o1 = stream.latestOffset().asInstanceOf[graft.sources.SpoolOffset]
    assert(o1.watermark.endsWith("part-0001.txt"))
    // simulate a transient empty/partial listing (file vanishes from view):
    // the offset must NOT regress — a regression would re-plan and re-read
    // every already-consumed file on the next full listing
    java.nio.file.Files.delete(dir.resolve("part-0001.txt"))
    val o2 = stream.latestOffset().asInstanceOf[graft.sources.SpoolOffset]
    assert(o2.watermark === o1.watermark, "offset regressed on empty listing")
    // a fresh stream instance (restart) seeds its high-water mark from the
    // checkpoint-restored offset, closing the same hole across restarts
    val restarted = new graft.sources.SpoolMicroBatchStream(dir.toString,
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    restarted.deserializeOffset(o1.json())
    val o3 = restarted.latestOffset().asInstanceOf[graft.sources.SpoolOffset]
    assert(o3.watermark === o1.watermark, "offset regressed after restart")
  }

  test("graft-spool V2: checkpointed restart resumes exactly (no replay, no loss)") {
    val base = java.nio.file.Files.createTempDirectory("spool_ckpt").toString
    val topic = Sources.rabbitMqInput.outputTopic
    val ckpt = s"$base/_checkpoint"
    val out = s"$base/_out"
    writeSpool(base, topic, Seq("r1", "r2"))
    def run(): Unit = {
      val q = Sources.rabbitMqInput.stream(spark, base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() === 2)
    // new file lands while no query is running; the restarted query must
    // deserialize the committed watermark and read ONLY the new file
    java.nio.file.Files.write(java.nio.file.Paths.get(base, topic, "part-1.txt"),
      "r3".getBytes("UTF-8"))
    run()
    val rows = spark.read.parquet(out).collect().map(_.getString(0)).sorted
    assert(rows === Array("r1", "r2", "r3"), "exactly-once across restart")
  }

  test("E3: legacy raw -> mux translate -> splitter per-type topics") {
    import spark.implicits._
    val raw = Seq(
      ("""{"uid":1,"name":"u","created":1698314400}""", 0),
      ("""{"shipId":"S-1","status":"SHIPPED","deliveredAt":1698314400}""", 4),
      ("""{"poison":true}""", 0)).toDF("value", "kind")
    val (t, routed) = Pipeline.legacyEvents(raw)
    assert(t.quarantine.count() === 1)
    val topics = routed.routed.select("topic").collect().map(_.getString(0)).sorted
    assert(topics === Array(
      "persistent://acme/integration/shipment-events",
      "persistent://acme/integration/user-profile-events"))
  }

  test("graft-spool sink: dynamic topic publish round-trips per tenant") {
    import spark.implicits._
    val msgs = (0 until 6).map(i =>
      s"""{"meta":{"tenantId":"t-${i % 3}"},"vehicleId":"veh-$i"}""")
    val r = Filterer.route(msgs.toDF("value"))
    val root = java.nio.file.Files.createTempDirectory("spool_sink").toString
    Filterer.fanOutTopics(r.routed, root)
    // each tenant's topic dir holds exactly that tenant's ORIGINAL bytes
    (0 until 3).foreach { t =>
      val dir = graft.sources.SpoolDataSource.topicDir(
        s"persistent://t-$t/integration/telemetry")
      val got = spark.read.format("graft-spool").load(s"$root/$dir")
        .collect().map(_.getString(0)).sorted
      assert(got === msgs.filter(_.contains(s""""t-$t"""")).sorted.toArray)
    }
    // committed names follow the spool contract: zero-padded, increasing
    // (dot-prefixed checksum/temp files are hidden from spool listings)
    val aDir = new java.io.File(root).listFiles().filter(_.isDirectory).head
    val names = aDir.listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(names.forall(_.matches("part-\\d{8}-[0-9a-f]{8}")), names.mkString(","))
    // and the whole bus reads back in ONE topic-tagged scan
    val bus = spark.read.format("graft-spool").option("topics", "true").load(root)
    assert(bus.columns === Array("topic", "value"))
    assert(bus.count() === 6)
    assert(bus.select("topic").distinct().count() === 3)
  }

  test("graft-spool sink: append continues the per-directory sequence") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("spool_seq").toString
    def publish(v: String): Unit =
      Seq(("persistent://a/n/t", v)).toDF("topic", "value")
        .coalesce(1).write.format("graft-spool").mode("append")
        .option("topics", "true").option("path", root).save()
    publish("m1"); publish("m2")
    val dir = s"$root/${graft.sources.SpoolDataSource.topicDir("persistent://a/n/t")}"
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(names.map(_.take(13)) === Array("part-00000000", "part-00000001"))
    assert(names.forall(_.matches("part-\\d{8}-[0-9a-f]{8}")), names.mkString(","))
    // a batch-published spool TAILS correctly: both files visible, in order
    val rows = spark.read.format("graft-spool").load(dir)
      .collect().map(_.getString(0))
    assert(rows.sorted === Array("m1", "m2"))
  }

  test("E1/E2 full topology: translators -> CMF -> Filterer -> bus, dead-letter replayable") {
    val base = spoolDir()
    val out = java.nio.file.Files.createTempDirectory("topology")
    val busRoot = s"$out/bus"
    val dlDir = s"$out/dead-letter"
    val (publish, deadLetter) = Pipeline.runVehicleTopology(
      spark, base, busRoot, dlDir, s"$out/_ckpt")
    try {
      publish.processAllAvailable()
      deadLetter.processAllAvailable()
    } finally { publish.stop(); deadLetter.stop() }
    val dl = spark.read.parquet(dlDir)
    // the geotab poison record lands tagged by its translator...
    assert(dl.filter(col("source") === "geotab-translator").count() === 1)
    // ...and reference parity for the §0.2 quirk: the reference's OWN
    // translators omit meta.tenantId, so the Filterer drops every
    // translated CMF message as unroutable (integration tests inject
    // routable payloads at the CMF topic directly — FiltererTest.kt:72)
    assert(dl.filter(col("source") === "filterer").count() === 3)
    val busDirs = Option(new java.io.File(busRoot).listFiles())
      .map(_.count(_.isDirectory)).getOrElse(0)
    assert(busDirs === 0, "nothing routable must mean an empty bus")
  }

  test("graft-spool sink: rejects values the line framing cannot carry") {
    import spark.implicits._
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    // \n splits a message; a bare \r does too (readLine terminates on
    // both), and a trailing \r would be silently dropped — all rejected
    for (bad <- Seq("line1\nline2", "line1\rline2", "trailing\r")) {
      val root = java.nio.file.Files.createTempDirectory("spool_bad").toString
      val e = intercept[Exception] {
        Seq(("persistent://a/n/t", bad)).toDF("topic", "value")
          .write.format("graft-spool").mode("append")
          .option("topics", "true").option("path", root).save()
      }
      assert(causes(e).exists(c =>
        c.getMessage != null && c.getMessage.contains("line terminator")),
        s"value ${bad.replace("\n", "\\n").replace("\r", "\\r")} not rejected")
    }
  }

  test("broker option-mapping lands on a real DataStreamReader: format + " +
    "reference-config options, asserted without a broker") {
    // reflect the reader's internals (source format + extraOptions) — the
    // mapping itself is the unit under test; no connector jar needed
    def inspect(r: org.apache.spark.sql.streaming.DataStreamReader)
        : (String, Map[String, String]) = {
      def field(name: String): Any = {
        val f = r.getClass.getDeclaredFields
          .find(_.getName.endsWith(name))
          .getOrElse(fail(s"DataStreamReader field $name not found — " +
            s"fields: ${r.getClass.getDeclaredFields.map(_.getName).mkString(", ")}"))
        f.setAccessible(true)
        f.get(r)
      }
      val fmt = field("source").asInstanceOf[String]
      // the reader stores a CaseInsensitiveMap — keys come back lowercased
      val opts = field("extraOptions").asInstanceOf[Iterable[(String, String)]]
      (fmt, opts.toMap)
    }
    def lc(m: Map[String, String]) = m.map { case (k, v) => (k.toLowerCase, v) }

    // S2 Kafka (connectors/kafka/config.sample.yml:8–16)
    val (kfmt, kopts) = inspect(Sources.kafkaInput.reader(spark))
    assert(kfmt === "kafka")
    assert(kopts === lc(Map(
      "kafka.bootstrap.servers" -> "kafka:9092",
      "subscribe" -> "my-kafka-topic",
      "kafka.group.id" -> "example-group",
      "startingOffsets" -> "earliest")))

    // S1 Kinesis (connectors/kinesis/config.sample.yml:10,14,15,21) —
    // region + endpoint ride along so a jar-equipped deployment can
    // actually connect (the reference config carries both)
    val (nfmt, nopts) = inspect(Sources.kinesisInput.reader(spark))
    assert(nfmt === "kinesis")
    assert(nopts === lc(Map(
      "streamName" -> "my-kinesis-stream",
      "startingPosition" -> "TRIM_HORIZON",
      "region" -> "us-east-1",
      "endpointUrl" -> "http://localstack:4566")))

    // S4 Event Hub kafka head: Kafka mapping + the SASL_SSL/PLAIN
    // handshake every Event Hubs Kafka endpoint requires
    val (efmt, eopts) = inspect(Sources.eventHubInput.reader(spark))
    assert(efmt === "kafka")
    assert(eopts("kafka.security.protocol") === "SASL_SSL")
    assert(eopts("kafka.sasl.mechanism") === "PLAIN")
    assert(eopts("subscribe") === "my-kafka-topic")

    // S7 Pulsar passthrough (pipeline.yaml:35–39)
    val (pfmt, popts) = inspect(Sources.pulsarInput.reader(spark))
    assert(pfmt === "pulsar")
    assert(popts === lc(Map(
      "service.url" -> "pulsar://localhost:6650",
      "topic" -> "upstream-topic")))

    // bridged sources carry no reader options (knobs configure the
    // receiver; the V2 seam takes only the spool path at load())
    assert(Sources.rabbitMqInput.readerOptions.isEmpty)
    assert(Sources.httpInput.readerOptions.isEmpty)

    // Spark's Kafka source forbids enable.auto.commit — a config asking
    // for it must fail at DEFINITION time, not at stream start
    intercept[IllegalArgumentException] {
      graft.sources.KafkaSource("bad", "b:9092", "t", "g",
        autoCommitEnabled = true, outputTopic = "raw")
    }
  }
}
