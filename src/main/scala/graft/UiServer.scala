package graft

import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** `dozer ui` — the live contract server. The reference runs a
  * ContractService on port 4555 behind a downloaded web app
  * (/root/reference/dozer-cli/src/ui/app/server.rs: `sources` →
  * per-connection source schemas, `sink_tables` → sink table schemas,
  * `generate_dot` → the pipeline DOT), with the build contract
  * computed up front from the config. This serves the SAME contract
  * over plain HTTP on the same JDK server stack the webhook source
  * and metrics endpoint already prove (zero-egress container — no
  * downloaded web bundle, so `/` renders a self-contained HTML page):
  *
  *  - `GET /dot`      → the pipeline graph, `text/vnd.graphviz`
  *  - `GET /sources`  → `{name: {format, path, schema}}` JSON
  *  - `GET /outputs`  → `{name: schema}` JSON (the INTO tables — the
  *                      reference's sink_tables surface: what each
  *                      sink consumes)
  *  - `GET /sinks`    → `[{table, mode, target}]` JSON
  *  - `GET /`         → HTML shell embedding all of the above
  *
  * The contract is computed ONCE at startup from the ANALYZED plans
  * (same path as [[GraftApp.dot]]) — this is a control-plane server;
  * no query runs per request.
  */
object UiServer {

  final case class Contract(
      dot: String,
      sources: Seq[(String, String, String, String)], // name, fmt, path, schema
      outputs: Seq[(String, String)], // name, schema
      sinks: Seq[(String, String, String)]) // table, mode, target

  final class Handle private[UiServer] (server: HttpServer,
      pool: java.util.concurrent.ExecutorService) {
    def port: Int = server.getAddress.getPort
    def address: java.net.InetSocketAddress = server.getAddress
    def stop(): Unit = { server.stop(0); pool.shutdown() }
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def sourcesJson(c: Contract): String = {
    val node = mapper.createObjectNode()
    c.sources.foreach { case (n, fmt, path, schema) =>
      val s = node.putObject(n)
      s.put("format", fmt); s.put("path", path); s.put("schema", schema)
    }
    node.toString
  }

  private def outputsJson(c: Contract): String = {
    val node = mapper.createObjectNode()
    c.outputs.foreach { case (n, schema) => node.put(n, schema) }
    node.toString
  }

  private def sinksJson(c: Contract): String = {
    val arr = mapper.createArrayNode()
    c.sinks.foreach { case (table, mode, target) =>
      val s = arr.addObject()
      s.put("table", table); s.put("mode", mode)
      s.put("target", redactTarget(target))
    }
    arr.toString
  }

  /** Sink targets are commonly JDBC URLs with embedded credentials
    * (`jdbc:x://user:pass@host/db`, `...?password=...`) and the
    * contract travels over unauthenticated HTTP — REDACT the secret
    * parts, keep the shape diagnosable.
    */
  private[graft] def redactTarget(target: String): String = {
    // userinfo between scheme's "//" and the LAST "@" before the
    // authority ends — greedy so a password containing '@'
    // (jdbc:x://u:p@ss@host/db) is fully redacted
    val noUser = target.replaceAll("(?i)(//)[^/?#\\s]*@", "$1***@")
    // password-ish key=value pairs in query/properties tails
    noUser.replaceAll(
      "(?i)(password|passwd|pwd|secret|token|sslpassword)=[^&;,\\s]*",
      "$1=***")
  }

  private def escHtml(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def indexHtml(c: Contract): String = {
    val src = c.sources.map { case (n, fmt, path, schema) =>
      s"<tr><td>${escHtml(n)}</td><td>${escHtml(fmt)}</td>" +
        s"<td>${escHtml(path)}</td><td><code>${escHtml(schema)}</code></td></tr>"
    }.mkString
    val out = c.outputs.map { case (n, schema) =>
      s"<tr><td>${escHtml(n)}</td><td><code>${escHtml(schema)}</code></td></tr>"
    }.mkString
    val snk = c.sinks.map { case (t, m, tg) =>
      s"<tr><td>${escHtml(t)}</td><td>${escHtml(m)}</td>" +
        s"<td>${escHtml(redactTarget(tg))}</td></tr>"
    }.mkString
    s"""<!doctype html><html><head><meta charset="utf-8">
       |<title>graft pipeline</title>
       |<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
       |td,th{border:1px solid #999;padding:4px 8px;text-align:left}
       |pre{background:#f4f4f4;padding:1em;overflow:auto}</style></head><body>
       |<h1>Pipeline contract</h1>
       |<h2>Sources</h2><table><tr><th>name</th><th>format</th><th>path</th><th>schema</th></tr>$src</table>
       |<h2>Outputs</h2><table><tr><th>table</th><th>schema</th></tr>$out</table>
       |<h2>Sinks</h2><table><tr><th>table</th><th>mode</th><th>target</th></tr>$snk</table>
       |<h2>Graph (DOT)</h2>
       |<p>Render with Graphviz, or fetch <a href="/dot">/dot</a>.</p>
       |<pre>${escHtml(c.dot)}</pre>
       |</body></html>""".stripMargin
  }

  def start(port: Int, contract: Contract,
      bindAll: Boolean = false): Handle = {
    System.setProperty("sun.net.httpserver.nodelay", "true")
    // LOOPBACK by default: the contract is control-plane metadata
    // (paths, schemas, sink targets) served without auth — exposing it
    // on 0.0.0.0 is an explicit opt-in (`bindAll`, wired from the
    // SPARK_GRAFT_UI_BIND_ALL env var in GraftApp), matching how the
    // reference's ContractService is fronted by a local proxy
    val addr =
      if (bindAll) new java.net.InetSocketAddress(port)
      else new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, port)
    val server = HttpServer.create(addr, 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    server.setExecutor(pool)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (status, body, ctype) =
          (ex.getRequestMethod, ex.getRequestURI.getPath) match {
            case ("GET", "/dot") =>
              (200, contract.dot, "text/vnd.graphviz")
            case ("GET", "/sources") =>
              (200, sourcesJson(contract), "application/json")
            case ("GET", "/outputs") =>
              (200, outputsJson(contract), "application/json")
            case ("GET", "/sinks") =>
              (200, sinksJson(contract), "application/json")
            case ("GET", "/") =>
              (200, indexHtml(contract), "text/html; charset=utf-8")
            case _ =>
              (404, "endpoints: /, /dot, /sources, /outputs, /sinks",
                "text/plain")
          }
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
}
