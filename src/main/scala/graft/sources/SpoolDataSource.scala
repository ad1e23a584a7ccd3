package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Spool-directory DataSourceV2 — the real source-API seam behind the
  * bridged connectors (SURVEY.md §2.1: RabbitMQ S3 / HTTP S5 / gRPC S6 have
  * no first-party Spark source; a receiver bridges messages into a spool
  * directory). Where the previous resolution borrowed the built-in text
  * file stream, this is the connector seam itself: a `TableProvider`
  * exposing BATCH_READ and MICRO_BATCH_READ over the spool, registered as
  * `graft-spool` — exactly the interface a live RabbitMQ/HTTP receiver
  * source would implement, with the spool directory standing in for the
  * broker cursor.
  *
  * Contract (matches the bridge receivers' behavior):
  *  - files are IMMUTABLE once written, with LEXICOGRAPHICALLY increasing
  *    names: the streaming watermark is a plain string comparison, so
  *    numeric sequence names MUST be zero-padded ("part-00009" then
  *    "part-00010"; an unpadded "part-9" followed by "part-10" sorts
  *    BACKWARDS and every later file would be silently skipped).
  *    Timestamp names must use a sortable format (ISO-8601/epoch, fixed
  *    width). Out-of-contract arrivals below the watermark are dropped by
  *    design (never double-read) and logged as warnings — see
  *    [[SpoolMicroBatchStream]];
  *  - BATCH reads snapshot the directory listing once per `load()` (the
  *    built-in file sources' InMemoryFileIndex semantics), so repeated
  *    actions on one DataFrame see one consistent file set even while the
  *    receiver keeps appending;
  *  - streaming offsets are a lexicographic FILENAME WATERMARK: a batch is
  *    (watermark, latest] in name order, so restarts resume exactly and a
  *    file that appears BELOW the watermark (out-of-contract) is dropped,
  *    never double-read;
  *  - one InputPartition per file (a production receiver coalesces spool
  *    files; at 100 TB the spool is the bridge buffer, not the lake);
  *  - the SESSION's Hadoop configuration rides to both the driver listing
  *    and the executor readers (SerializableConfiguration), so an
  *    hdfs:/s3a: spool with `spark.hadoop.*` credentials behaves exactly
  *    like a local one.
  */
object SpoolDataSource {
  val NAME = "graft-spool"
  val SCHEMA: StructType = StructType(Seq(StructField("value", StringType)))
  /** Schema of the `topics` mode (option `topics=true`): the whole bus —
    * row-level topic + payload, the Kafka sink/source column contract. */
  val TOPIC_SCHEMA: StructType = StructType(Seq(
    StructField("topic", StringType), StructField("value", StringType)))
  /** Schema of the `format=warc` mode: one row per ISO-28500 record,
    * split by [[Warc.parseStream]]'s Content-Length framing — the crawl
    * ingestion seam (`file` is the spool file name; HTTP responses carry
    * status + html, other record types null them). */
  val WARC_SCHEMA: StructType = StructType(Seq(
    StructField("file", StringType), StructField("rec_index", IntegerType),
    StructField("warc_type", StringType), StructField("record_id", StringType),
    StructField("target_uri", StringType), StructField("warc_date", StringType),
    StructField("content_length", LongType), StructField("http_status", IntegerType),
    StructField("html", StringType)))

  /** Topic name → spool sub-directory. Topic URIs carry characters Hadoop
    * paths reject (the `:` in `persistent://tenant/ns/topic`), so the
    * mapping percent-encodes everything outside [A-Za-z0-9._-] —
    * deterministic, collision-free, and reversible, so a bridge daemon
    * draining spool dirs to a real broker can recover the exact topic. */
  def topicDir(topic: String): String =
    topic.getBytes(java.nio.charset.StandardCharsets.UTF_8).map {
      case b if (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == '.' || b == '_' || b == '-' =>
        b.toChar.toString
      case b => f"%%${b & 0xff}%02X"
    }.mkString

  /** Inverse of [[topicDir]] — a bridge daemon recovers the broker topic
    * from the spool directory name. */
  def topicFromDir(dir: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < dir.length) {
      if (dir.charAt(i) == '%') {
        out.write(Integer.parseInt(dir.substring(i + 1, i + 3), 16)); i += 3
      } else { out.write(dir.charAt(i).toInt); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The active session's Hadoop conf — spark.hadoop.* settings included. */
  private[sources] def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Sorted (name, fullPath) listing of the spool; missing dir = empty
    * (the topic simply has not produced yet — matches broker semantics). */
  private[sources] def listFiles(dir: String, conf: Configuration): Seq[(String, String)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
      .map(s => (s.getPath.getName, s.getPath.toString))
      .sortBy(_._1)
  }

  /** `topics` mode listing: every topic sub-directory of the bus root,
    * flattened to (decoded topic, filePath). Directory count is
    * topology-scale (one per topic/tenant); file listing parallelism is
    * not needed at that cardinality. */
  private[sources] def listTopicFiles(root: String, conf: Configuration): Seq[(String, String)] = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      // same hidden-name contract as the file listing: checkpoint /
      // _spark_metadata / .snapshot dirs under the bus root are NOT topics
      .filterNot(d => d.getPath.getName.startsWith(".") ||
        d.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
      .flatMap { d =>
        // a directory that does not decode as a topic (someone else's
        // data dropped under the bus root) is skipped loudly, not fatal
        // to every read of the whole bus
        try {
          val topic = topicFromDir(d.getPath.getName)
          listFiles(d.getPath.toString, conf).map { case (_, fp) => (topic, fp) }
        } catch {
          case _: NumberFormatException | _: StringIndexOutOfBoundsException =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"$NAME: ignoring non-topic directory ${d.getPath} " +
                "(name is not a percent-encoded topic)")
            Seq.empty
        }
      }
  }
}

class SpoolDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = SpoolDataSource.NAME
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if ("warc".equalsIgnoreCase(options.get("format"))) SpoolDataSource.WARC_SCHEMA
    else if (options.getBoolean("topics", false)) SpoolDataSource.TOPIC_SCHEMA
    else SpoolDataSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-spool requires a path")
    val warc = "warc".equalsIgnoreCase(properties.get("format"))
    val topics = "true".equalsIgnoreCase(properties.get("topics"))
    require(!(warc && topics),
      "graft-spool: format=warc reads one spool directory of WARC files — " +
        "it does not compose with topics=true bus mode")
    new SpoolTable(path, topics, warc)
  }
}

/** `topics = false` (default): one spool directory = one topic, schema
  * `(value)`, batch + micro-batch reads — the consumer side of a single
  * bridged source. `topics = true`: `path` is a BUS ROOT holding one
  * sub-directory per topic, schema `(topic, value)` — the Kafka column
  * contract on both sides: batch read returns every message on the bus
  * tagged with its topic; writes route each row to its topic's directory.
  * Streaming reads stay per-topic (a multi-topic watermark would couple
  * unrelated topics' progress; subscribe per topic as Kafka does). */
class SpoolTable(path: String, topics: Boolean = false,
                 warc: Boolean = false)
    extends Table with SupportsRead with SupportsWrite {
  // captured at table creation (driver): one conf for every scan this
  // DataFrame plans, serializable for the executor-side readers
  private val conf = new SerializableConfiguration(SpoolDataSource.hadoopConf())
  // batch consistency: freeze the listing at first batch use, NOT per
  // action — df.count() then df.collect() must see the same files
  private lazy val batchSnapshot: Seq[SpoolFilePartition] =
    if (topics)
      SpoolDataSource.listTopicFiles(path, conf.value)
        .map { case (t, fp) => SpoolFilePartition(fp, t) }
    else
      SpoolDataSource.listFiles(path, conf.value)
        .map { case (_, fp) => SpoolFilePartition(fp, null) }

  override def name(): String = s"${SpoolDataSource.NAME}($path)"
  override def schema(): StructType =
    if (warc) SpoolDataSource.WARC_SCHEMA
    else if (topics) SpoolDataSource.TOPIC_SCHEMA else SpoolDataSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    // warc: read-only — batch (a crawl archive as a replay corpus) and
    // micro-batch (a LIVE crawl tailing the spool: per-file batches over
    // the same filename-watermark offsets, round-13 directive). Writes
    // stay unadvertised: a value/topic write against the 9-column WARC
    // schema has no meaning, and the missing capability is a clean
    // analysis error
    (if (warc) Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
     else if (topics)
      Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.STREAMING_WRITE)
     else Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
       TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new SpoolScan(path, topics, conf, () => batchSnapshot, warc)
    }

  /** Publish seam (the write half of the bridge contract): the Kafka sink's
    * row-level dynamic routing, re-expressed over the spool. Input schema is
    * `value STRING` plus an optional `topic STRING` column — with `topic`
    * present each row lands in `path/<topicDir(topic)>/`, mirroring the
    * reference Filterer's dynamic `persistent://{tenantId}/...` publish
    * (Filterer.kt:36–41); without it every row goes to `path` itself (the
    * fixed-topic producer). Append-only, as a broker topic is: Spark's
    * overwrite mode is rejected (no SupportsTruncate). Values are framed one
    * per line (the read contract), so a `value` containing a newline is
    * rejected at write time rather than silently split into two messages. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fieldNames.contains("value") &&
      s("value").dataType == StringType,
      s"${SpoolDataSource.NAME} sink requires a `value` STRING column; got $s")
    val topicIdx = s.fieldNames.indexOf("topic")
    require(topicIdx < 0 || s("topic").dataType == StringType,
      s"${SpoolDataSource.NAME} sink `topic` column must be STRING; got $s")
    require(s.fieldNames.forall(f => f == "value" || f == "topic"),
      s"${SpoolDataSource.NAME} sink accepts only (topic?, value); got $s")
    // a topics=true bus read lists only SUB-directories — rows written to
    // the root itself would be committed yet invisible to every reader
    require(!topics || topicIdx >= 0,
      s"${SpoolDataSource.NAME} sink: topics=true requires a `topic` column " +
        "(rows without one would land in the bus root, unreadable in topics mode)")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new SpoolBatchWrite(path, s.fieldNames.indexOf("value"), topicIdx, conf)
        override def toStreaming: StreamingWrite =
          new SpoolStreamingWrite(path, s.fieldNames.indexOf("value"), topicIdx, conf)
      }
    }
  }
}

class SpoolScan(path: String, topics: Boolean, conf: SerializableConfiguration,
                snapshot: () => Seq[SpoolFilePartition],
                warc: Boolean = false) extends Scan {
  override def readSchema(): StructType =
    if (warc) SpoolDataSource.WARC_SCHEMA
    else if (topics) SpoolDataSource.TOPIC_SCHEMA else SpoolDataSource.SCHEMA
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      snapshot().map(p => p: InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      if (warc) new WarcReaderFactory(conf) else new SpoolReaderFactory(conf)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(!topics, s"${SpoolDataSource.NAME}: streaming reads are per-topic " +
      "— point readStream at one topic directory (topics=true is batch-only)")
    // warc streams too (round-13 directive): a live crawl is the one
    // genuinely streaming source in the domain — per-FILE micro-batches
    // over the same filename-watermark offsets, each batch's files parsed
    // by the record reader exactly as in batch mode
    new SpoolMicroBatchStream(path, conf, warc)
  }
}

/** Streaming offset: the highest spool filename read so far ("" = nothing).
  * Watermark-by-name (not a file count) makes restart resumption exact and
  * immunizes planning against late out-of-order files. */
case class SpoolOffset(watermark: String) extends Offset {
  override def json(): String = watermark
}

class SpoolMicroBatchStream(path: String, conf: SerializableConfiguration,
                            warc: Boolean = false)
    extends MicroBatchStream {
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(classOf[SpoolMicroBatchStream])
  // Names at or below a batch's start watermark that are legitimately
  // accounted for: everything this run planned into a batch, plus
  // everything already at/below the restart watermark the FIRST time this
  // stream plans (those were read by a previous run). A file later
  // observed at/below the watermark that is in neither set arrived OUT OF
  // CONTRACT (non-lexicographic naming, e.g. unpadded sequence numbers) —
  // it will never be read, so make the drop loud instead of silent.
  // Driver-side state, bounded by the spool's file count (the spool is the
  // bridge buffer, not the lake).
  @transient private var accounted: Set[String] = null
  @transient private var warnedDropped: Set[String] = Set.empty

  private def noteDropped(files: Seq[(String, String)], watermark: String): Unit = {
    if (accounted == null)
      accounted = files.collect { case (n, _) if n <= watermark => n }.toSet
    val dropped = files.collect { case (n, _)
      if n <= watermark && !accounted.contains(n) && !warnedDropped.contains(n) => n }
    if (dropped.nonEmpty) {
      log.warn(s"graft-spool($path): ${dropped.size} file(s) sort at or below " +
        s"the committed watermark '$watermark' but were never part of a batch " +
        s"and will NEVER be read: ${dropped.take(5).mkString(", ")}" +
        (if (dropped.size > 5) ", ..." else "") +
        ". The spool contract requires lexicographically increasing names " +
        "(zero-pad sequence numbers).")
      warnedDropped ++= dropped
    }
  }

  // High-water mark of every offset this stream object has returned:
  // latestOffset must be MONOTONE. A transient empty/partial directory
  // listing would otherwise regress the watermark to "" (or a lower name),
  // and the next full listing would re-plan — and re-read — every already-
  // consumed file above it: mass duplicates downstream. (Spark restores
  // committed offsets from its own checkpoint on restart, so this guard
  // only needs to span one stream instance's lifetime.)
  @transient private var highWater: String = ""

  override def initialOffset(): Offset = SpoolOffset("")
  override def deserializeOffset(json: String): Offset = {
    // a restart seeds the high-water mark from the restored offset, so a
    // bad listing in the FIRST trigger after restart cannot regress either
    val o = SpoolOffset(json)
    if (o.watermark > highWater) highWater = o.watermark
    o
  }
  override def latestOffset(): Offset = {
    val files = SpoolDataSource.listFiles(path, conf.value)
    val seen = if (files.isEmpty) "" else files.last._1
    if (seen > highWater) highWater = seen
    SpoolOffset(highWater)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SpoolOffset].watermark
    val hi = end.asInstanceOf[SpoolOffset].watermark
    val files = SpoolDataSource.listFiles(path, conf.value)
    noteDropped(files, lo)
    val batch = files.filter { case (name, _) => name > lo && name <= hi }
    accounted ++= batch.map(_._1)
    batch.map(f => SpoolFilePartition(f._2): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    if (warc) new WarcReaderFactory(conf) else new SpoolReaderFactory(conf)
  override def commit(end: Offset): Unit = () // spool files are retained
  override def stop(): Unit = ()
}

/** One spool file; `topic` is non-null only in `topics` mode (the reader
  * then emits the two-column (topic, value) rows). */
case class SpoolFilePartition(filePath: String, topic: String = null)
    extends InputPartition

/** One task-written temp file: which spool dir it belongs to, its hidden
  * temp name, and the writing partition (the commit orders by partition so
  * final sequence numbers are deterministic given the upstream plan). */
case class SpoolWriteEntry(dir: String, tmpName: String, partitionId: Int)
case class SpoolCommitMessage(entries: Seq[SpoolWriteEntry]) extends WriterCommitMessage

/** Two-phase spool publish. Tasks write `.tmp-*` files — the dot prefix
  * makes them INVISIBLE to [[SpoolDataSource.listFiles]], so concurrent
  * readers never observe an uncommitted batch. The driver-side job commit
  * then renames each to the next zero-padded `part-NNNNNNNN` per directory,
  * continuing after the highest existing sequence — which is exactly the
  * lexicographically-increasing-name contract the streaming watermark
  * needs, so a micro-batch consumer tails a spool that a batch job is
  * publishing into. A failed task's temp files are deleted by abort; a
  * crashed executor's stragglers stay hidden behind the dot prefix. */
private object SpoolCommit {
  /** Driver-side commit: per directory, rename the batch's temp files to
    * the next zero-padded sequence names after the highest already
    * committed. Shared by the batch and streaming forms — an epoch commit
    * IS a batch commit over that epoch's temp files. */
  def commit(messages: Array[WriterCommitMessage],
             conf: SerializableConfiguration): Unit = {
    val entries = messages.collect { case SpoolCommitMessage(es) => es }.flatten
    entries.groupBy(_.dir).foreach { case (dir, es) =>
      val p = new Path(dir)
      val fs = p.getFileSystem(conf.value)
      val existing = SpoolDataSource.listFiles(dir, conf.value)
        .map(_._1).filter(_.startsWith("part-"))
      var seq = existing
        .map(n => n.stripPrefix("part-").takeWhile(_.isDigit))
        .filter(_.nonEmpty).map(_.toLong).foldLeft(-1L)(math.max) + 1
      // Final names carry a commit-unique suffix (md5 of this commit's
      // temp-file set): two writers that race into one topic directory
      // (batch publish while a streaming epoch commits) can compute the
      // same next-sequence from the same point-in-time listing, and a
      // POSIX rename would silently REPLACE the other commit's file.
      // Distinct suffixes make the destinations disjoint; names still
      // sort after every earlier sequence, so the streaming watermark
      // contract holds, and the digit prefix still drives the next
      // commit's numbering.
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(es.map(_.tmpName).sorted.mkString(",")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      // deterministic final order: by writing partition, then temp name
      es.sortBy(e => (e.partitionId, e.tmpName)).foreach { e =>
        val to = new Path(dir, f"part-$seq%08d-$tag")
        // rename reports failure as `false`, not an exception — a silent
        // miss here would drop a committed task's messages
        require(!fs.exists(to) && fs.rename(new Path(dir, e.tmpName), to),
          s"${SpoolDataSource.NAME} commit: rename ${e.tmpName} -> $to failed in $dir")
        seq += 1
      }
    }
  }

  def abort(messages: Array[WriterCommitMessage],
            conf: SerializableConfiguration): Unit =
    messages.collect { case SpoolCommitMessage(es) => es }.flatten.foreach { e =>
      val p = new Path(e.dir, e.tmpName)
      val fs = p.getFileSystem(conf.value)
      if (fs.exists(p)) fs.delete(p, false)
    }
}

class SpoolBatchWrite(root: String, valueIdx: Int, topicIdx: Int,
                      conf: SerializableConfiguration) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SpoolWriterFactory(root, valueIdx, topicIdx, conf)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    SpoolCommit.commit(messages, conf)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    SpoolCommit.abort(messages, conf)
}

/** Streaming publish: one [[SpoolCommit]] per epoch. Delivery is
  * AT-LEAST-ONCE on failure recovery — matching the Kafka sink's
  * documented guarantee (and strictly stronger than the reference
  * Filterer's fire-and-forget `sendAsync`, which loses messages on
  * failure, Filterer.kt:42–45): a crash between an epoch's renames and
  * Spark's offset-log commit replays the epoch into fresh sequence
  * numbers. Readers needing exactly-once dedup on message content, as
  * they must with Kafka. */
class SpoolStreamingWrite(root: String, valueIdx: Int, topicIdx: Int,
                          conf: SerializableConfiguration) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new SpoolStreamingWriterFactory(root, valueIdx, topicIdx, conf)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    SpoolCommit.commit(messages, conf)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    SpoolCommit.abort(messages, conf)
}

/** Top-level (NOT an inner class): the factory ships to executors, and an
  * anonymous subclass would drag its enclosing StreamingWrite — which
  * holds nothing serializable-worthy — into the task closure. */
class SpoolStreamingWriterFactory(root: String, valueIdx: Int, topicIdx: Int,
                                  conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new SpoolDataWriter(root, valueIdx, topicIdx, partitionId, taskId,
      conf, epochId)
}

class SpoolWriterFactory(root: String, valueIdx: Int, topicIdx: Int,
                         conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SpoolDataWriter(root, valueIdx, topicIdx, partitionId, taskId, conf)
}

class SpoolDataWriter(root: String, valueIdx: Int, topicIdx: Int,
                      partitionId: Int, taskId: Long,
                      conf: SerializableConfiguration,
                      epochId: Long = -1L) extends DataWriter[InternalRow] {
  // one open temp file per topic this task has seen; task-scoped names
  // (partitionId + taskId, plus the epoch in streaming mode) cannot
  // collide across speculative attempts or epochs
  private val open = scala.collection.mutable.LinkedHashMap[
    String, (SpoolWriteEntry, java.io.BufferedWriter)]()
  private var n = 0

  private def writerFor(dir: String): java.io.BufferedWriter =
    open.getOrElseUpdate(dir, {
      val epochTag = if (epochId < 0) "" else s"e$epochId-"
      val name = f".tmp-$epochTag$partitionId%05d-$taskId-${open.size}%03d"
      val p = new Path(dir, name)
      val fs = p.getFileSystem(conf.value)
      fs.mkdirs(new Path(dir))
      (SpoolWriteEntry(dir, name, partitionId), new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(fs.create(p, false),
          java.nio.charset.StandardCharsets.UTF_8)))
    })._2

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(valueIdx),
      s"${SpoolDataSource.NAME} sink: null `value` (row ${n} of partition $partitionId)")
    val value = row.getUTF8String(valueIdx).toString
    // BufferedReader.readLine() on the consume side terminates on \n, \r,
    // AND \r\n — a bare carriage return would silently split the message
    require(!value.exists(c => c == '\n' || c == '\r'),
      s"${SpoolDataSource.NAME} sink: `value` contains a line terminator — " +
        "the spool frames one message per line (escape or re-encode the payload)")
    val dir =
      if (topicIdx < 0) root
      else {
        require(!row.isNullAt(topicIdx),
          s"${SpoolDataSource.NAME} sink: null `topic` (row $n of partition " +
            s"$partitionId) — route or filter null topics before publishing")
        s"$root/${SpoolDataSource.topicDir(row.getUTF8String(topicIdx).toString)}"
      }
    val w = writerFor(dir)
    w.write(value); w.write('\n')
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._2.close())
    SpoolCommitMessage(open.values.map(_._1).toSeq)
  }
  override def abort(): Unit = {
    open.values.foreach { case (e, w) =>
      try w.close() catch { case _: Exception => () }
      val p = new Path(e.dir, e.tmpName)
      val fs = p.getFileSystem(conf.value)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }
  override def close(): Unit = ()
}

/** `format=warc` reader: one spool file = one sequence of ISO-28500
  * records, split by [[Warc.parseStream]]'s Content-Length framing and
  * emitted one row per record ([[SpoolDataSource.WARC_SCHEMA]]). The
  * parser streams the file — a multi-GB WARC never materializes whole. */
class WarcReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[SpoolFilePartition]
    new PartitionReader[InternalRow] {
      private val p = new Path(part.filePath)
      private val fileName = UTF8String.fromString(p.getName)
      private val in = p.getFileSystem(conf.value).open(p)
      private val records = Warc.parseStream(in).zipWithIndex
      private var current: InternalRow = _
      private def utf8(s: String): AnyRef =
        if (s == null) null else UTF8String.fromString(s)
      override def next(): Boolean =
        if (!records.hasNext) false
        else {
          val ((hs, body), idx) = records.next()
          // file_id is unused on this path (the file NAME is the id)
          val r = Warc.toRow(0L, idx, hs, body)
          current = new GenericInternalRow(Array[Any](fileName,
            r.rec_index, utf8(r.warc_type), utf8(r.record_id),
            utf8(r.target_uri), utf8(r.warc_date), r.content_length,
            r.http_status.map(Integer.valueOf).orNull, utf8(r.html)))
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

class SpoolReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[SpoolFilePartition]
    new PartitionReader[InternalRow] {
      // hadoop FS (not java.io) with the SESSION conf, so hdfs:/s3a: spools
      // read identically on a cluster (credentials, nameservices included)
      private val p = new Path(part.filePath)
      private val in = p.getFileSystem(conf.value).open(p)
      private val lines = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      private val topicUtf8 =
        if (part.topic == null) null else UTF8String.fromString(part.topic)
      private var current: String = _
      override def next(): Boolean = { current = lines.readLine(); current != null }
      override def get(): InternalRow =
        if (topicUtf8 == null)
          new GenericInternalRow(Array[Any](UTF8String.fromString(current)))
        else
          new GenericInternalRow(Array[Any](topicUtf8, UTF8String.fromString(current)))
      override def close(): Unit = lines.close()
    }
  }
}
