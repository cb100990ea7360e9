package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function parity layer (SURVEY §2.4).
  *
  * Dozer's expression surface (reference: dozer-sql/expression/src/
  * scalar/common.rs:20-32, conditional.rs:9-13, datetime.rs:13-21,
  * geo/common.rs:11-14, json_functions.rs:13-16) mapped onto Spark:
  * native `functions._` / Catalyst builtins wherever one exists
  * (codegen'd), Scala UDFs only for the genuinely nonstandard ones
  * (chrono-style TO_CHAR, geodesic DISTANCE).
  *
  * Everything is exposed twice: as Column functions here (DataFrame
  * API) and as SQL names registered on the session ([[registerAll]])
  * so `spark.sql("SELECT UCASE(name) ...")` works like dozer's dialect.
  */
object GraftFunctions {

  // ---- Column API ------------------------------------------------------

  /** UCASE — reference scalar/string.rs:25 */
  def ucase(c: Column): Column = upper(c)

  /** NVL(a, b) — reference scalar/field.rs:6 */
  def nvl(a: Column, b: Column): Column = coalesce(a, b)

  /** DECODE(expr, s1, r1, ..., default) — reference scalar/field.rs:40.
    * Chained when/otherwise; null-safe equality like Oracle/dozer
    * (NULL matches NULL).
    */
  def decodeExpr(expr: Column, pairsAndDefault: Column*): Column = {
    require(pairsAndDefault.size >= 2, "DECODE needs at least one search/result pair")
    val hasDefault = pairsAndDefault.size % 2 == 1
    val pairs = (if (hasDefault) pairsAndDefault.dropRight(1) else pairsAndDefault)
      .grouped(2).map { case Seq(s, r) => (s, r) }.toSeq
    val default = if (hasDefault) pairsAndDefault.last else lit(null)
    val first = when(expr <=> pairs.head._1, pairs.head._2)
    pairs.tail.foldLeft(first) { case (acc, (s, r)) =>
      acc.when(expr <=> s, r)
    }.otherwise(default)
  }

  /** TO_CHAR(ts, fmt) with chrono-style %-patterns —
    * reference scalar/string.rs:244.
    */
  def toChar(ts: Column, fmt: Column): Column = ToCharUdf(ts, fmt)

  /** POINT(x, y) — reference geo/point.rs */
  def point(x: Column, y: Column): Column = struct(x.as("x"), y.as("y"))

  /** DISTANCE(p1, p2, algo) in meters — reference geo/distance.rs:18-31.
    * Algorithms: GEODESIC (default), HAVERSINE, VINCENTY.
    */
  def distance(p1: Column, p2: Column, algo: String = "GEODESIC"): Column =
    GeoUdfs.distance(p1, p2, algo)

  private val jsonValueUdf =
    udf((j: String, p: String) => JsonPathEval.value(j, p))
  private val jsonQueryUdf =
    udf((j: String, p: String) => JsonPathEval.query(j, p))

  /** JSON_VALUE(json, path) — scalar result as string
    * (reference json_functions.rs:44-77). For literal paths prefer
    * Spark's codegen'd `get_json_object(json, "$.k")`.
    */
  def jsonValue(json: Column, path: Column): Column = jsonValueUdf(json, path)

  /** JSON_QUERY(json, path) — json-typed result serialized back to text
    * (reference json_functions.rs:78-118).
    */
  def jsonQuery(json: Column, path: Column): Column = jsonQueryUdf(json, path)

  // ---- SQL registration ------------------------------------------------

  /** Register the dialect's nonstandard names for SQL use. Safe to call
    * repeatedly (createOrReplace semantics).
    */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Chr, Expression, If, IsNotNull, Upper}
    val reg = spark.sessionState.functionRegistry

    def temp(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    temp("ucase")(es => Upper(es.head))
    temp("chr")(es => Chr(es.head)) // dozer CHR — scalar/string.rs:279
    temp("nvl2") { case Seq(a, b, c) => If(IsNotNull(a), b, c) } // NVL is builtin
    temp("dot_product") {
      case Seq(a, b) =>
        org.apache.spark.sql.graft.VectorExpressions.DotProduct(a, b)
      case es => wrongNumArgs("dot_product", 2, es.length)
    }
    ToCharUdf.register(spark)
    GeoUdfs.register(spark)
    HopWindows.register(spark)
    spark.udf.register("json_value",
      (j: String, p: String) => JsonPathEval.value(j, p))
    spark.udf.register("json_query",
      (j: String, p: String) => JsonPathEval.query(j, p))

    // ---- training-data pipeline functions on the SQL surface ----------
    // Column-composite builtins converted through the Column↔Expression
    // shim: SQL configs (GraftSqlRunner / `dozer run` YAML) get the same
    // pipeline gates the DataFrame API has.
    import org.apache.spark.sql.GraftShims.{column => c, toCatalyst => e}
    import graft.operators.TextOps
    def temp1(name: String)(f: Column => Column): Unit =
      temp(name) {
        case Seq(x) => e(f(c(x)))
        case es => wrongNumArgs(name, 1, es.length)
      }
    temp1("token_count")(TextOps.tokenCount)
    temp1("token_estimate")(TextOps.tokenEstimate)
    temp1("quality_score")(TextOps.qualityScore(_, defaultStopwords))
    temp1("lang_id")(TextOps.langId)
    temp1("scrub_pii")(TextOps.scrubPii)
    temp1("fingerprint64")(TextOps.fingerprint64(_))
    temp1("simhash64")(x => TextOps.simhash64(TextOps.tokens(x)))
    temp1("canonical_url")(TextOps.canonicalizeUrl)
    temp1("url_host")(TextOps.urlHost)
    temp1("registered_domain")(x => TextOps.registeredDomain(TextOps.urlHost(x)))

    // KMV distinct sketches in plain SQL: `kmv_sketch(CAST(key AS
    // STRING))` per group (k=32 — the q115 family's default), estimated
    // or set-operated downstream; the arrays are the same sketches the
    // Column operator and the streaming state build.
    spark.udf.register("kmv_sketch",
      org.apache.spark.sql.functions.udaf(
        graft.operators.Kmv.sketchAggregator(32)))
    spark.udf.register("kmv_estimate",
      (kmv: Seq[Long]) => graft.operators.Kmv.estimateValue(kmv.toArray, 32))
  }

  /** Stopword set backing SQL `quality_score` (the English marker list —
    * deployments pass their own via the Column API).
    */
  val defaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Shared user-facing arity error for SQL-registered functions. */
  private[graft] def wrongNumArgs(name: String, expected: Int, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
}
