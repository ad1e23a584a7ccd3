package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
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
}

class SpoolDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = SpoolDataSource.NAME
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpoolDataSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-spool requires a path")
    new SpoolTable(path)
  }
}

class SpoolTable(path: String) extends Table with SupportsRead {
  // captured at table creation (driver): one conf for every scan this
  // DataFrame plans, serializable for the executor-side readers
  private val conf = new SerializableConfiguration(SpoolDataSource.hadoopConf())
  // batch consistency: freeze the listing at first batch use, NOT per
  // action — df.count() then df.collect() must see the same files
  private lazy val batchSnapshot: Seq[(String, String)] =
    SpoolDataSource.listFiles(path, conf.value)

  override def name(): String = s"${SpoolDataSource.NAME}($path)"
  override def schema(): StructType = SpoolDataSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SpoolScan(path, conf, () => batchSnapshot)
    }
}

class SpoolScan(path: String, conf: SerializableConfiguration,
                snapshot: () => Seq[(String, String)]) extends Scan {
  override def readSchema(): StructType = SpoolDataSource.SCHEMA
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      snapshot().map(f => SpoolFilePartition(f._2): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new SpoolReaderFactory(conf)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SpoolMicroBatchStream(path, conf)
}

/** Streaming offset: the highest spool filename read so far ("" = nothing).
  * Watermark-by-name (not a file count) makes restart resumption exact and
  * immunizes planning against late out-of-order files. */
case class SpoolOffset(watermark: String) extends Offset {
  override def json(): String = watermark
}

class SpoolMicroBatchStream(path: String, conf: SerializableConfiguration)
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
    new SpoolReaderFactory(conf)
  override def commit(end: Offset): Unit = () // spool files are retained
  override def stop(): Unit = ()
}

case class SpoolFilePartition(filePath: String) extends InputPartition

class SpoolReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SpoolFilePartition].filePath
    new PartitionReader[InternalRow] {
      // hadoop FS (not java.io) with the SESSION conf, so hdfs:/s3a: spools
      // read identically on a cluster (credentials, nameservices included)
      private val p = new Path(file)
      private val in = p.getFileSystem(conf.value).open(p)
      private val lines = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      private var current: String = _
      override def next(): Boolean = { current = lines.readLine(); current != null }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(current)))
      override def close(): Unit = lines.close()
    }
  }
}
