package graft.functions

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.types._

/** Python scalar UDF runtime.
  *
  * The reference resolves `function_name<RETURN_TYPE>(args)` calls against
  * a `python_udf` module on `$VIRTUAL_ENV`'s interpreter, invoking the
  * function per record through an embedded interpreter
  * (dozer-sql/expression/src/python_udf.rs:29-81: VIRTUAL_ENV lookup,
  * `python_udf` module import, per-record call, typed extraction, and the
  * Decimal/Date/Timestamp/Point/Duration/Json return types rejected as
  * unsupported).
  *
  * The Spark-idiomatic shape is PySpark's own worker model re-expressed
  * for a Scala engine: each Spark task thread lazily launches ONE
  * long-lived `python3` child (stdlib-only bootstrap, no PySpark) and
  * streams calls over a JSON-lines pipe. Workers are reused across tasks
  * scheduled on the same executor thread, so the per-partition cost is
  * amortized exactly like PySpark's daemon-forked workers; at 1000
  * executors this is embarrassingly parallel map work with zero shuffle
  * and one small child process per core.
  *
  * Registration makes `name` a Spark SQL function taking a single STRUCT
  * argument (arity-independent — `name(struct(a, b))`); the dialect
  * runner rewrites the reference's `name<type>(a, b)` syntax to that form
  * (see [[graft.sql.SqlText.rewritePythonUdfs]]).
  */
object PyUdf {

  /** Stdlib-only worker loop: argv[1] = module dir. One JSON array
    * request `[function, [args...]]` per line; one `{"v": value}` or
    * `{"e": message}` response per line. Binary travels as
    * `{"b64": ...}` both ways.
    */
  private val bootstrap =
    """import sys, json, base64, importlib
      |sys.path.insert(0, sys.argv[1])
      |mod = importlib.import_module("python_udf")
      |def unwrap(a):
      |    if isinstance(a, dict) and "b64" in a:
      |        return base64.b64decode(a["b64"])
      |    return a
      |out = sys.stdout
      |for line in sys.stdin:
      |    try:
      |        req = json.loads(line)
      |        f = getattr(mod, req[0])
      |        v = f(*[unwrap(a) for a in req[1]])
      |        if isinstance(v, (bytes, bytearray)):
      |            v = {"b64": base64.b64encode(bytes(v)).decode()}
      |        out.write(json.dumps({"v": v}))
      |    except Exception as e:
      |        out.write(json.dumps({"e": "%s: %s" % (type(e).__name__, e)}))
      |    out.write("\n")
      |    out.flush()
      |""".stripMargin

  /** Reference return-type surface (python_udf.rs:63-78) mapped onto
    * Spark types; 64-bit JVM lanes for the 128-bit reference lanes.
    */
  def sparkType(returnType: String): DataType =
    returnType.toLowerCase match {
      case "int" | "i128" | "uint" | "u128" => LongType
      case "int8"                           => IntegerType
      case "float"                          => DoubleType
      case "boolean"                        => BooleanType
      case "string" | "text"                => StringType
      case "binary"                         => BinaryType
      case other =>
        // python_udf.rs:74-77 rejects these same types
        throw new IllegalArgumentException(s"Unsupported return type: $other")
    }

  /** Interpreter + module-dir resolution: explicit dir wins, then the
    * reference's `VIRTUAL_ENV` contract (python_udf.rs:42-44).
    */
  def resolveModuleDir(explicit: Option[String]): String =
    explicit.orElse(sys.env.get("VIRTUAL_ENV")).getOrElse(
      throw new IllegalStateException("Missing 'VIRTUAL_ENV' environment var"))

  private def interpreterFor(moduleDir: String): String = {
    val venvPy = new java.io.File(moduleDir, "bin/python")
    if (venvPy.canExecute) venvPy.getAbsolutePath else "python3"
  }

  /** True when a worker could start (used by tests to skip, not fake). */
  def pythonAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "--version").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  // ---- worker pool: one child per (task thread, module dir) ----------

  private final class Worker(moduleDir: String) {
    private val proc = {
      val pb = new ProcessBuilder(interpreterFor(moduleDir), "-c", bootstrap, moduleDir)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT) // executor stderr log
      pb.start()
    }
    private val in = new BufferedWriter(new OutputStreamWriter(
      proc.getOutputStream, StandardCharsets.UTF_8))
    private val out = new BufferedReader(new InputStreamReader(
      proc.getInputStream, StandardCharsets.UTF_8))

    def alive: Boolean = proc.isAlive

    def call(line: String): String = {
      in.write(line); in.write('\n'); in.flush()
      val resp = out.readLine()
      if (resp == null)
        throw new java.io.IOException("python_udf worker exited mid-call")
      resp
    }

    def close(): Unit = proc.destroy()
  }

  private val allWorkers = new ConcurrentLinkedQueue[Worker]()
  sys.addShutdownHook { allWorkers.forEach(_.close()) }

  private val workers = new ThreadLocal[mutable.Map[String, Worker]] {
    override def initialValue(): mutable.Map[String, Worker] = mutable.Map.empty
  }

  private def workerFor(moduleDir: String): Worker = {
    val m = workers.get()
    m.get(moduleDir).filter(_.alive).getOrElse {
      m.get(moduleDir).foreach { dead => dead.close(); allWorkers.remove(dead) }
      val w = new Worker(moduleDir)
      allWorkers.add(w)
      m(moduleDir) = w
      w
    }
  }

  // ---- wire marshaling ----------------------------------------------

  private val mapper = new ObjectMapper()

  private def encodeArg(node: ArrayNode, v: Any): Unit = v match {
    case null                 => node.addNull()
    case b: Boolean           => node.add(b)
    case b: Byte              => node.add(b.toInt)
    case s: Short             => node.add(s.toInt)
    case i: Int               => node.add(i)
    case l: Long              => node.add(l)
    case f: Float             => node.add(f.toDouble)
    case d: Double            => node.add(d)
    case d: java.math.BigDecimal => node.add(d)
    case s: String            => node.add(s)
    case b: Array[Byte] =>
      node.addObject().put("b64", Base64.getEncoder.encodeToString(b))
    case seq: scala.collection.Seq[_] =>
      val arr = node.addArray(); seq.foreach(encodeArg(arr, _))
    case arr: Array[_] =>
      val a = node.addArray(); arr.foreach(encodeArg(a, _))
    case r: Row =>
      val a = node.addArray()
      (0 until r.length).foreach(i => encodeArg(a, r.get(i)))
    case ts: java.sql.Timestamp => node.add(ts.toString)
    case d: java.sql.Date       => node.add(d.toString)
    case other                  => node.add(other.toString)
  }

  private def requestLine(fn: String, args: Seq[Any]): String = {
    val root = mapper.createArrayNode()
    root.add(fn)
    val argNode = root.addArray()
    args.foreach(encodeArg(argNode, _))
    mapper.writeValueAsString(root)
  }

  private def decodeResult(fn: String, resp: String, ret: DataType): Any = {
    val node = mapper.readTree(resp)
    val err = node.get("e")
    if (err != null)
      throw new RuntimeException(s"python_udf.$fn: ${err.asText()}")
    val v = node.get("v")
    if (v == null || v.isNull) return null
    ret match {
      case LongType    => v.asLong()
      case IntegerType => v.asInt()
      case DoubleType  => v.asDouble()
      case BooleanType => v.asBoolean()
      case StringType  => if (v.isTextual) v.asText() else v.toString
      case BinaryType =>
        val b = v.get("b64")
        if (b != null) Base64.getDecoder.decode(b.asText())
        else throw new RuntimeException(
          s"python_udf.$fn: expected bytes, got ${v.getNodeType}")
      case other => throw new IllegalArgumentException(
        s"Unsupported return type: $other")
    }
  }

  /** One synchronous call on this thread's worker; restarts a dead
    * worker once before giving up (executor-local, no driver involvement).
    */
  def call(moduleDir: String, fn: String, args: Seq[Any], ret: DataType): Any = {
    val line = requestLine(fn, args)
    val resp =
      try workerFor(moduleDir).call(line)
      catch {
        case _: java.io.IOException =>
          workers.get().remove(moduleDir).foreach { w => w.close(); allWorkers.remove(w) }
          workerFor(moduleDir).call(line)
      }
    decodeResult(fn, resp, ret)
  }

  /** Write a deterministic `python_udf.py` module under java.io.tmpdir
    * and return its directory — the fixture path for the oracled query
    * and the specs. On a real cluster the module dir must exist on every
    * executor, exactly the reference's `$VIRTUAL_ENV` contract (the
    * interpreter and module live executor-side there too).
    */
  def ensureFixtureModule(source: String, subdir: String): String = {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"), subdir)
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "python_udf.py").toPath,
      source.getBytes(StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  /** Register `name` as a SQL function over a single STRUCT argument:
    * `name(struct(a, b))`. The struct makes the registration
    * arity-independent (mixed arg types welcome), which is what lets the
    * dialect rewrite of `name<type>(a, b)` stay purely syntactic.
    */
  def register(spark: SparkSession, name: String, returnType: String,
      moduleDir: Option[String] = None): Unit = {
    val ret = sparkType(returnType) // type check before env resolution
    val dir = resolveModuleDir(moduleDir.orElse(
      Option(spark.conf.get("spark.graft.python_udf.dir", null))))
    val f = new UDF1[Row, Any] {
      override def call(row: Row): Any = {
        val args = if (row == null) Nil
          else (0 until row.length).map(row.get)
        PyUdf.call(dir, name, args, ret)
      }
    }
    spark.udf.register(name, f, ret)
  }
}
