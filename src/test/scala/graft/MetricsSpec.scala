package graft

import graft.obs.Metrics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Observability surface: listener aggregation + Prometheus text rendering
  * (SURVEY §2 parity with the reference's prometheus/grafana deploy). */
class MetricsSpec extends SparkSpec {

  private def eventually[A](timeoutMs: Long = 20000)(f: => A): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    throw last
  }

  test("batch actions and streaming progress render as Prometheus exposition text") {
    import spark.implicits._
    val (q, s) = Metrics.install(spark)
    try {
      // one batch action (QueryExecutionListener fires async on the bus)
      Seq(1, 2, 3).toDF("v").collect()
      // one streaming query with a named memory sink
      val ms = MemoryStream[Int](spark)
      ms.addData(10, 20, 30, 40)
      val sq = ms.toDF().writeStream.format("memory")
        .queryName("metrics_stream").outputMode("append").start()
      sq.processAllAvailable()

      // while LIVE: both batch-action and streaming series present
      val text = eventually() {
        val t = Metrics.prometheusText(q, s)
        assert(t.contains("graft_query_duration_seconds_count{action=\"collect\"}"))
        assert(t.contains("graft_stream_input_rows_sum{query=\"metrics_stream\"} 4"))
        t
      }
      // exposition-format shape: every non-comment line is `name{labels} value`
      val lines = text.split("\n").filterNot(l => l.startsWith("#") || l.isEmpty)
      assert(lines.nonEmpty)
      assert(lines.forall(_.matches("""[a-z_]+\{[a-z]+="[^"]*"\} -?[0-9.E+-]+""")),
        lines.mkString("\n"))

      // textfile-collector publication is atomic and re-readable
      val out = java.nio.file.Files.createTempDirectory("metrics")
        .resolve("graft.prom").toString
      Metrics.writeTextfile(out, q, s)
      val read = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out)), "UTF-8")
      assert(read.contains("# TYPE graft_stream_input_rows_count counter"))

      // after termination: the query's series END (no phantom gauges, maps
      // bounded by live queries)
      sq.stop()
      eventually() {
        val t = Metrics.prometheusText(q, s)
        assert(!t.contains("metrics_stream"), "terminated query still exported")
      }
    } finally {
      spark.listenerManager.unregister(q)
      spark.streams.removeListener(s)
    }
  }

  test("failed actions count into graft_query_failures_total") {
    import spark.implicits._
    val (q, s) = Metrics.install(spark)
    try {
      val boom = Seq("1", "x").toDF("v")
        .selectExpr("assert_true(v = '1') ok")
      intercept[Exception] { boom.collect() }
      eventually() {
        val t = Metrics.prometheusText(q, s)
        assert(t.contains("graft_query_failures_total{action=\"collect\"} 1"))
      }
    } finally {
      spark.listenerManager.unregister(q)
      spark.streams.removeListener(s)
    }
  }
}
