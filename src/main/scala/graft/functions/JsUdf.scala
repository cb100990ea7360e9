package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.types.StringType

/** Spark bridge for JavaScript UDFs (`UdfType::JavaScript { module }`,
  * dozer-types/src/models/udf_config.rs:28-33).
  *
  * Contract parity with the reference (dozer-sql/expression/src/
  * javascript/evaluate.rs:104-127, validate.rs:10-27): the module's
  * default export is called with exactly ONE JSON-shaped argument and
  * returns JSON. Spark-side the registered function takes one column of
  * any type (structs become objects, arrays become arrays) and returns
  * the result serialized as a JSON string — Spark's `Field::Json`
  * analogue — which composes with `get_json_object` / `from_json` /
  * `CAST` downstream.
  *
  * Execution model: the module is parsed and its top level executed once
  * per (task thread × module) — [[JsMini.Module]] instances hold mutable
  * module state, so they are thread-confined exactly like [[PyUdf]]'s
  * worker processes. Per-row evaluation is then lock-free, in-JVM, and
  * embarrassingly parallel: no shuffle, no process boundary, scales
  * linearly with executor cores at 100 TB.
  */
object JsUdf {

  /** A self-contained multi-module program: the executor-shipped form
    * of an entry script plus its transitive imports
    * ([[JsModules.bundleFromPath]]); single-file modules are a
    * one-entry bundle.
    */
  final case class Bundle(entry: String, sources: Map[String, String])

  private val modules = new ThreadLocal[mutable.Map[Bundle, JsMini.Module]] {
    override def initialValue(): mutable.Map[Bundle, JsMini.Module] =
      mutable.Map.empty
  }

  private def moduleFor(b: Bundle): JsMini.Module =
    modules.get().getOrElseUpdate(b, JsMini.loadBundle(b.sources, b.entry))

  /** Spark value → JS value. Rows carry their schema (field names become
    * object keys); binary becomes base64 (JSON has no byte type — same
    * convention as the [[PyUdf]] wire format).
    */
  def toJs(v: Any): JsMini.V = v match {
    case null                 => JsMini.VNull
    case b: Boolean           => JsMini.VBool(b)
    case b: Byte              => JsMini.VNum(b)
    case s: Short             => JsMini.VNum(s)
    case i: Int               => JsMini.VNum(i)
    case l: Long              => JsMini.VNum(l.toDouble)
    case f: Float             => JsMini.VNum(f)
    case d: Double            => JsMini.VNum(d)
    case d: java.math.BigDecimal => JsMini.VNum(d.doubleValue())
    case d: BigDecimal        => JsMini.VNum(d.doubleValue)
    case s: String            => JsMini.VStr(s)
    case b: Array[Byte] =>
      JsMini.VStr(java.util.Base64.getEncoder.encodeToString(b))
    case r: Row =>
      val fields = mutable.LinkedHashMap.empty[String, JsMini.V]
      val names = if (r.schema != null) r.schema.fieldNames
        else (0 until r.length).map(i => s"_$i").toArray
      var i = 0
      while (i < r.length) {
        fields(names(i)) = toJs(r.get(i)); i += 1
      }
      new JsMini.VObj(fields)
    case seq: scala.collection.Seq[_] =>
      new JsMini.VArr(mutable.ArrayBuffer(seq.map(toJs).toSeq: _*))
    case arr: Array[_] =>
      new JsMini.VArr(mutable.ArrayBuffer(arr.map(toJs).toSeq: _*))
    case m: scala.collection.Map[_, _] =>
      val fields = mutable.LinkedHashMap.empty[String, JsMini.V]
      m.foreach { case (k, mv) => fields(String.valueOf(k)) = toJs(mv) }
      new JsMini.VObj(fields)
    case ts: java.sql.Timestamp => JsMini.VStr(ts.toString)
    case d: java.sql.Date       => JsMini.VStr(d.toString)
    case other                  => JsMini.VStr(other.toString)
  }

  /** Evaluate one row: marshal in, call the default export, serialize the
    * JSON result (undefined → SQL NULL).
    */
  def evalRow(bundle: Bundle, arg: Any): String =
    moduleFor(bundle).callDefault(toJs(arg)) match {
      case JsMini.VUndef => null
      case v             => JsMini.stringify(v)
    }

  /** Register `name(col)` returning a JSON string (single-file module). */
  def register(spark: SparkSession, name: String, moduleSource: String): Unit =
    registerBundle(spark, name,
      Bundle("main.js", Map("main.js" -> moduleSource)))

  /** Register a multi-module program (entry + transitive imports). */
  def registerBundle(spark: SparkSession, name: String,
      bundle: Bundle): Unit = {
    // fail fast on syntax errors / unresolvable imports / missing
    // default export, driver-side — the reference validates the module
    // at build time too
    JsMini.loadBundle(bundle.sources, bundle.entry).defaultExport
    val f = new UDF1[Any, String] {
      override def call(arg: Any): String = evalRow(bundle, arg)
    }
    spark.udf.register(name, f, StringType)
  }

  /** Register from a module file path — any Hadoop filesystem (HDFS/S3/
    * local), so cluster submission works unchanged. Relative `import`s
    * next to the entry file are bundled transitively
    * ([[JsModules.bundleFromPath]]), so multi-file reference scripts
    * load as they do under dozer-deno's module loader.
    */
  def registerFromPath(spark: SparkSession, name: String, path: String): Unit = {
    val (entry, sources) = JsModules.bundleFromPath(spark, path)
    registerBundle(spark, name, Bundle(entry, sources))
  }
}
