package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Prometheus-style telemetry endpoint for `dozer run` — the reference
  * serves its metrics registry over HTTP
  * (/root/reference/dozer-tracing/src/prometheus_server.rs:15: GET
  * `/metrics` → text-format encode, any other path → 404 pointing at
  * /metrics; configured by `telemetry.metrics: !Prometheus{address}`,
  * dozer-types/src/models/telemetry.rs:39-56).
  *
  * Spark-native shape: the metrics ARE the session's
  * `StreamingQueryListener` progress stream — [[StreamMetrics.Recorder]]
  * keeps latest-snapshot gauges plus monotone cumulative counters, and
  * this server renders them in the Prometheus text exposition format
  * (0.0.4) on the same JDK HTTP stack the webhook source already
  * proves. Pure driver-side control plane: a scrape walks O(#queries)
  * entries, touching no executor or data path.
  */
object MetricsServer {

  final class Handle private[MetricsServer] (server: HttpServer,
      pool: java.util.concurrent.ExecutorService) {
    /** Bound port — pass port=0 to start and let the OS choose. */
    def port: Int = server.getAddress.getPort
    def stop(): Unit = { server.stop(0); pool.shutdown() }
  }

  /** Serve `GET /metrics` from `recorder`'s live counters. */
  def start(port: Int, recorder: StreamMetrics.Recorder): Handle = {
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    server.setExecutor(pool)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (status, body, ctype) =
          if (ex.getRequestMethod == "GET" &&
              ex.getRequestURI.getPath == "/metrics")
            (200, render(recorder), "text/plain; version=0.0.4")
          else // reference parity: point strays at the real path
            (404, "Metrics are available on /metrics ", "text/plain")
        val bytes = body.getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", ctype)
        ex.sendResponseHeaders(status, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    new Handle(server, pool)
  }

  private def esc(label: String): String =
    label.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Prometheus text exposition (0.0.4) of the recorder state. */
  def render(recorder: StreamMetrics.Recorder): String = {
    val sb = new StringBuilder
    def family(name: String, help: String, kind: String,
        rows: Seq[(String, String)]): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name $kind\n")
      rows.foreach { case (q, v) =>
        sb.append(s"""$name{query="${esc(q)}"} $v""").append('\n')
      }
    }
    sb.append("# HELP graft_up Whether this pipeline process is serving\n")
    sb.append("# TYPE graft_up gauge\ngraft_up 1\n")
    family("graft_input_rows_total",
      "Cumulative input rows per streaming query", "counter",
      recorder.inputRowsTotal().toSeq.sortBy(_._1)
        .map { case (q, v) => (q, v.toString) })
    family("graft_batches_total",
      "Cumulative micro-batches per streaming query", "counter",
      recorder.batchesTotal().toSeq.sortBy(_._1)
        .map { case (q, v) => (q, v.toString) })
    val snaps = recorder.all().toSeq.sortBy(_._1).map(_._2)
    family("graft_batch_id", "Latest micro-batch id", "gauge",
      snaps.map(s => (s.name, s.batchId.toString)))
    family("graft_last_batch_input_rows",
      "Input rows of the latest micro-batch", "gauge",
      snaps.map(s => (s.name, s.numInputRows.toString)))
    family("graft_input_rows_per_second",
      "Source arrival rate of the latest micro-batch", "gauge",
      snaps.map(s => (s.name, s.inputRowsPerSecond.toString)))
    family("graft_processed_rows_per_second",
      "Processing rate of the latest micro-batch", "gauge",
      snaps.map(s => (s.name, s.processedRowsPerSecond.toString)))
    family("graft_last_batch_duration_ms",
      "Wall-clock duration of the latest micro-batch", "gauge",
      snaps.map(s => (s.name, s.batchDurationMs.toString)))
    family("graft_state_rows",
      "Total stateful-operator rows held for the query", "gauge",
      snaps.map(s => (s.name, s.stateRowsTotal.toString)))
    family("graft_state_memory_bytes",
      "Total state-store memory held for the query", "gauge",
      snaps.map(s => (s.name, s.stateMemoryBytes.toString)))
    // watermark rows exist only once a query HAS one (batch 0 of an
    // event-time query reports none; append-only queries never do)
    family("graft_watermark_epoch_ms",
      "Event-time watermark of the query, epoch milliseconds", "gauge",
      snaps.flatMap(s => s.watermarkMs.map(w => (s.name, w.toString))))
    // per-stateful-operator breakdown, labelled like the reference's
    // per-entity telemetry (dozer-tracing/src/constants.rs table/
    // connection labels): which operator holds the state, how big, and
    // last-batch churn
    def opFamily(name: String, help: String,
        value: StreamMetrics.OperatorState => Long): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name gauge\n")
      snaps.foreach { s =>
        s.operators.foreach { o =>
          sb.append(s"""$name{query="${esc(s.name)}",operator="${esc(o.operator)}"} ${value(o)}""")
            .append('\n')
        }
      }
    }
    opFamily("graft_state_operator_rows",
      "State rows held per stateful operator", _.rowsTotal)
    opFamily("graft_state_operator_memory_bytes",
      "State-store memory per stateful operator", _.memoryBytes)
    opFamily("graft_state_operator_rows_updated",
      "State rows updated in the latest micro-batch", _.rowsUpdated)
    opFamily("graft_state_operator_rows_removed",
      "State rows evicted in the latest micro-batch (watermark TTL)",
      _.rowsRemoved)
    sb.toString
  }
}
