package graft.obs

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability parity with the reference's prometheus/grafana stack
  * (deploy/prometheus/prometheus.yml, deploy/grafana/ — config-only there:
  * the dashboards chart broker-level rates). Spark already exports
  * executor/task metrics natively (`spark.ui.prometheus.enabled`, the
  * PrometheusServlet sink — cluster CONFIG, not code); what a pipeline
  * additionally needs, and what this module provides, is the JOB-level
  * surface those dashboards chart: per-action row counts and durations,
  * failure counters, and per-trigger streaming progress.
  *
  * Two standard listeners aggregate in memory; [[prometheusText]] renders
  * the Prometheus text exposition format (0.0.4) and [[writeTextfile]]
  * publishes it via the node-exporter textfile-collector contract (atomic
  * tmp+rename) — no servlet, no extra dependencies, works in a zero-egress
  * container and on a 1000-executor cluster alike (listeners run on the
  * driver; aggregation cost is O(queries), independent of data size).
  */
object Metrics {

  private[obs] final class Counter {
    val count = new AtomicLong(0)
    val sum = new DoubleAdder
    def observe(v: Double): Unit = { count.incrementAndGet(); sum.add(v) }
  }

  /** Batch/action metrics keyed by the DataFrameWriter/action name. */
  final class QueryMetricsListener extends QueryExecutionListener {
    private[obs] val durations = new ConcurrentHashMap[String, Counter]()
    private[obs] val outputRows = new ConcurrentHashMap[String, Counter]()
    private[obs] val failures = new ConcurrentHashMap[String, AtomicLong]()

    private def counter(m: ConcurrentHashMap[String, Counter], k: String) =
      m.computeIfAbsent(k, _ => new Counter)

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      counter(durations, funcName).observe(durationNs / 1e9)
      // top-node numOutputRows is the action's produced row count where the
      // plan exposes it (write/collect nodes do); absent metric = skip
      qe.executedPlan.metrics.get("numOutputRows")
        .foreach(m => counter(outputRows, funcName).observe(m.value.toDouble))
    }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      failures.computeIfAbsent(funcName, _ => new AtomicLong).incrementAndGet()
  }

  /** Streaming progress metrics keyed by query name (or id when unnamed).
    * A query's series END at termination: its keys are dropped in
    * onQueryTerminated, so gauges never report phantom state for dead
    * queries and a restart-heavy driver's maps stay bounded by the number
    * of LIVE queries (termination events carry only the id, so an id→name
    * index is kept alongside). */
  final class StreamingMetricsListener extends StreamingQueryListener {
    private[obs] val inputRows = new ConcurrentHashMap[String, Counter]()
    private[obs] val batchDurations = new ConcurrentHashMap[String, Counter]()
    private[obs] val stateRows = new ConcurrentHashMap[String, AtomicLong]()
    private val idToKey = new ConcurrentHashMap[String, String]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      idToKey.put(p.id.toString, name)
      inputRows.computeIfAbsent(name, _ => new Counter)
        .observe(p.numInputRows.toDouble)
      Option(p.durationMs.get("triggerExecution")).foreach(ms =>
        batchDurations.computeIfAbsent(name, _ => new Counter)
          .observe(ms.toDouble / 1000.0))
      val st = p.stateOperators.map(_.numRowsTotal).sum
      stateRows.computeIfAbsent(name, _ => new AtomicLong).set(st)
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      val key = idToKey.remove(e.id.toString)
      if (key != null) {
        inputRows.remove(key)
        batchDurations.remove(key)
        stateRows.remove(key)
      }
    }
  }

  /** Install both listeners on the session; returns them for rendering. */
  def install(spark: SparkSession): (QueryMetricsListener, StreamingMetricsListener) = {
    val q = new QueryMetricsListener
    val s = new StreamingMetricsListener
    spark.listenerManager.register(q)
    spark.streams.addListener(s)
    (q, s)
  }

  private def esc(label: String): String =
    label.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** Prometheus text exposition format 0.0.4. Counter pairs render as
    * `_count`/`_sum` (the summary-lite shape dashboards rate() over). */
  def prometheusText(q: QueryMetricsListener, s: StreamingMetricsListener): String = {
    val sb = new StringBuilder
    def family(name: String, help: String, typ: String,
               rows: Seq[(String, String)]): Unit = {
      if (rows.nonEmpty) {
        sb.append(s"# HELP $name $help\n# TYPE $name $typ\n")
        rows.sortBy(_._1).foreach { case (line, v) => sb.append(s"$line $v\n") }
      }
    }
    def summary(metric: String, help: String, labelKey: String,
                m: ConcurrentHashMap[String, Counter]): Unit = {
      val entries = m.asScala.toSeq
      family(s"${metric}_count", s"$help (count)", "counter",
        entries.map { case (k, c) =>
          (s"""${metric}_count{$labelKey="${esc(k)}"}""", c.count.get.toString) })
      family(s"${metric}_sum", s"$help (sum)", "counter",
        entries.map { case (k, c) =>
          (s"""${metric}_sum{$labelKey="${esc(k)}"}""", fmt(c.sum.sum)) })
    }
    summary("graft_query_duration_seconds", "Batch action wall-clock",
      "action", q.durations)
    summary("graft_query_output_rows", "Batch action output rows",
      "action", q.outputRows)
    family("graft_query_failures_total", "Batch action failures", "counter",
      q.failures.asScala.toSeq.map { case (k, v) =>
        (s"""graft_query_failures_total{action="${esc(k)}"}""", v.get.toString) })
    summary("graft_stream_input_rows", "Streaming rows ingested per trigger",
      "query", s.inputRows)
    summary("graft_stream_batch_seconds", "Streaming trigger execution time",
      "query", s.batchDurations)
    family("graft_stream_state_rows", "Streaming state store rows", "gauge",
      s.stateRows.asScala.toSeq.map { case (k, v) =>
        (s"""graft_stream_state_rows{query="${esc(k)}"}""", v.get.toString) })
    sb.toString
  }

  /** Publish for the node-exporter textfile collector: write-then-rename so
    * the scraper never reads a torn file. */
  def writeTextfile(path: String, q: QueryMetricsListener,
                    s: StreamingMetricsListener): Unit = {
    val target = java.nio.file.Paths.get(path)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      prometheusText(q, s).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
