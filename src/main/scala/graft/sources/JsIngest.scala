package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.JsMini
import graft.functions.JsMini._

/** JavaScript ingestion connector (reference
  * `dozer-ingestion/javascript/src/lib.rs`): a user script runs on the
  * embedded JS runtime and pushes CDC envelopes through an `ingest` op —
  * `{typ: "Insert"|"Delete"|"Update"|"SnapshottingDone", old_val,
  * new_val}` (the shape `js_extension/ingest.js` emits). The connector
  * exposes ONE table, `json_records`, with ONE Json column `value`
  * (lib.rs:25-58 — "maximum flexibility to the user").
  *
  * Here the script runs on [[JsMini]] with the same op injected two
  * ways: a plain `ingest(msg)` global and the deno-verbatim
  * `Deno[Deno.internal].core.ops.ingest` path, so reference bootstrap
  * scripts run unchanged (minus `fetch` — this engine has no network
  * runtime by design; hosts inject a `fetch` shim through
  * `extraGlobals` when the script needs one, e.g. replaying a captured
  * HTTP response).
  *
  * Scale shape: like the reference's single deno runtime, the script is
  * a driver-side generator — the CDC envelopes it emits are the source
  * (bounded by what one script produces), and everything downstream is
  * distributed. The change log lands in a DataFrame and flows through
  * the same CDC machinery as Debezium envelopes.
  */
object JsIngest {

  /** One emitted envelope; values are JSON-serialized (`Field::Json`). */
  final case class ChangeRow(seq: Long, op: String,
      old_val: String, new_val: String)

  private val validOps = Set("Insert", "Delete", "Update", "SnapshottingDone")

  /** Run a bootstrap script, collecting its `ingest` calls in order. */
  def runScript(src: String,
      extraGlobals: Map[String, V] = Map.empty): Seq[ChangeRow] =
    runScriptBundle(Map("main.js" -> src), "main.js", extraGlobals)

  /** Multi-module variant: bootstrap scripts may `import` relative
    * helper modules, resolved from the bundle (the dozer-deno module
    * loader seam — see [[graft.functions.JsModules]]).
    */
  def runScriptBundle(sources: Map[String, String], entry: String,
      extraGlobals: Map[String, V] = Map.empty): Seq[ChangeRow] = {
    val out = mutable.ArrayBuffer.empty[ChangeRow]
    val ingest = VNative("ingest", { args =>
      val msg = args.headOption.getOrElse(VUndef) match {
        case o: VObj => o
        case other =>
          throw new JsError(VStr(s"ingest expects an object, got ${JsMini.toDisplay(other)}"))
      }
      val typ = msg.fields.get("typ") match {
        case Some(VStr(t)) if validOps(t) => t
        case other => throw new JsError(VStr(
          s"ingest message typ must be one of ${validOps.mkString("/")}, got " +
            other.map(JsMini.toDisplay).getOrElse("nothing")))
      }
      def jsonOf(key: String): String = msg.fields.get(key) match {
        case None | Some(VNull) | Some(VUndef) => null
        case Some(v)                           => JsMini.stringify(v)
      }
      out += ChangeRow(out.length.toLong, typ, jsonOf("old_val"), jsonOf("new_val"))
      VUndef
    })
    // deno-verbatim op path: Deno[Deno.internal].core.ops.ingest
    val deno = JsMini.obj(
      "internal" -> VStr("__graft_internal__"),
      "__graft_internal__" -> JsMini.obj(
        "core" -> JsMini.obj("ops" -> JsMini.obj("ingest" -> ingest))))
    JsMini.loadBundle(sources, entry,
      Map("ingest" -> ingest, "Deno" -> deno) ++ extraGlobals)
    out.toSeq
  }

  /** The raw change log as a DataFrame — feed for CDC-aware pipelines
    * (`seq` preserves script emission order).
    */
  def changeLog(spark: SparkSession, scriptSrc: String,
      extraGlobals: Map[String, V] = Map.empty): DataFrame = {
    import spark.implicits._
    runScript(scriptSrc, extraGlobals).toDF()
  }

  /** The connector's `json_records` table: current state after replaying
    * the envelopes — whole-value identity (the connector defines no PK):
    * Insert appends `new_val`, Delete removes one row equal to
    * `old_val`, Update rewrites one row equal to `old_val` to `new_val`.
    */
  def jsonRecords(spark: SparkSession, scriptSrc: String,
      extraGlobals: Map[String, V] = Map.empty): DataFrame =
    jsonRecordsBundle(spark, Map("main.js" -> scriptSrc), "main.js",
      extraGlobals)

  /** [[jsonRecords]] over a multi-module bundle. */
  def jsonRecordsBundle(spark: SparkSession,
      sources: Map[String, String], entry: String,
      extraGlobals: Map[String, V] = Map.empty): DataFrame = {
    val state = mutable.ArrayBuffer.empty[String]
    runScriptBundle(sources, entry, extraGlobals).foreach { c =>
      c.op match {
        case "Insert" => state += c.new_val
        case "Delete" =>
          val i = state.indexOf(c.old_val)
          if (i >= 0) state.remove(i)
        case "Update" =>
          val i = state.indexOf(c.old_val)
          if (i >= 0) state(i) = c.new_val else state += c.new_val
        case "SnapshottingDone" => // phase marker, no state effect
      }
    }
    import spark.implicits._
    state.toSeq.toDF("value")
  }

  /** Load the bootstrap script from any Hadoop filesystem. */
  def readModule(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
