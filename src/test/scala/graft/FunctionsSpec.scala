package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeoUtils, JsonPathEval, ToCharUdf}

class FunctionsSpec extends AnyFunSuite {

  // ---- TO_CHAR (reference expression tests: scalar/string.rs to_char) ----
  test("to_char formats chrono-style patterns") {
    val micros = 1704067798778549L // 2024-01-01 00:09:58.778549 UTC
    assert(ToCharUdf.format(micros, "%Y-%m-%d") == "2024-01-01")
    assert(ToCharUdf.format(micros, "%H:%M:%S") == "00:09:58")
    assert(ToCharUdf.format(micros, "%Y-%m-%d %H:%M") == "2024-01-01 00:09")
    assert(ToCharUdf.format(micros, "%d/%m/%y") == "01/01/24")
    assert(ToCharUdf.format(micros, "%A %B") == "Monday January")
    assert(ToCharUdf.format(micros, "100%% done") == "100% done")
  }

  // ---- JSONPath (reference: dozer-sql/jsonpath + json_functions.rs) ----
  test("json_value extracts scalars, json_query extracts structure") {
    val doc = """{"a": {"b": [1, 2, {"c": "x"}]}, "s": "str", "n": 1.5, "t": true}"""
    assert(JsonPathEval.value(doc, "$.s") == "str")
    assert(JsonPathEval.value(doc, "$.n") == "1.5")
    assert(JsonPathEval.value(doc, "$.t") == "true")
    assert(JsonPathEval.value(doc, "$.a.b[0]") == "1")
    assert(JsonPathEval.value(doc, "$.a.b[2].c") == "x")
    assert(JsonPathEval.value(doc, "$.a") == null) // object is not a scalar
    assert(JsonPathEval.value(doc, "$.missing") == null)
    assert(JsonPathEval.query(doc, "$.a.b") == """[1,2,{"c":"x"}]""")
    assert(JsonPathEval.query(doc, "$['a']['b'][1]") == "2")
    assert(JsonPathEval.value("not json", "$.a") == null)
  }

  // ---- DISTANCE (reference: geo/distance.rs) ----
  test("haversine and vincenty distances match known values") {
    // Paris -> New York
    val hav = GeoUtils.haversine(2.3522, 48.8566, -74.0060, 40.7128)
    assert(math.abs(hav - 5837240.9) < 1.0, s"haversine=$hav")
    val vin = GeoUtils.vincenty(2.3522, 48.8566, -74.0060, 40.7128)
    assert(math.abs(vin - 5853101.0) < 200.0, s"vincenty=$vin") // WGS84 ~5853 km
    assert(GeoUtils.vincenty(1.0, 2.0, 1.0, 2.0) == 0.0)
    assert(GeoUtils.dispatch("GEODESIC", 0, 0, 1, 0) > 111000)
    assertThrows[IllegalArgumentException](GeoUtils.dispatch("NOPE", 0, 0, 1, 1))
  }

  test("decode and nvl column builders evaluate correctly") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((0, null: String), (1, "a"), (2, "b")).toDF("k", "v")
    val out = df.select(
      graft.functions.GraftFunctions.decodeExpr(col("k"),
        lit(0), lit("zero"), lit(1), lit("one"), lit("other")).as("d"),
      graft.functions.GraftFunctions.nvl(col("v"), lit("-")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("zero", "-"), ("one", "a"), ("other", "b")))
  }

  test("SQL-registered functions work through spark.sql") {
    val spark = SparkFixture.spark
    val r = spark.sql(
      "SELECT UCASE('abc') u, TO_CHAR(TIMESTAMP '2024-01-02 03:04:05', '%Y/%m/%d') t, " +
        "JSON_VALUE('{\"k\": 7}', '$.k') j, " +
        "NVL2('x', 'notnull', 'null') n1, NVL2(NULL, 'notnull', 'null') n2").collect()(0)
    assert(r.getString(0) == "ABC")
    assert(r.getString(1) == "2024/01/02")
    assert(r.getString(2) == "7")
    assert(r.getString(3) == "notnull" && r.getString(4) == "null")
  }
}
