package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
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

  test("DotProduct expression matches interpreted formulation and stays in codegen") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.graft.VectorExpressions
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, -5.0f, 6.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
    val interpreted = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val out = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("native"),
      interpreted.as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // null array propagates
    val nul = Seq((null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("a", "b")
      .select(VectorExpressions.dot(col("a"), col("b"))).collect()(0)
    assert(nul.isNullAt(0))
    // the projection compiles into a WholeStageCodegen span (a file
    // scan, not a local relation, which Catalyst folds at plan time)
    val emb = Tables.load(spark, SparkFixture.sf0001, "embeddings")
    val plan = emb
      .select(VectorExpressions.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [dot_product"))
  }

  test("DotProduct nulls: null element or length mismatch yield NULL like zip_with") {
    val spark = SparkFixture.spark
    val rows = spark.sql(
      "SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(2.0D, 3.0D)) a, " +
        "dot_product(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D)) b, " +
        "dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) c, " +
        "dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) d").collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(rows.getDouble(3) == 11.0)
  }

  test("normalizeFloat produces unit vectors, zero vector passes through") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.graft.VectorExpressions
    val df = Seq(Array(3.0f, 4.0f), Array(0.0f, 0.0f)).toDF("v")
    val rows = df.select(VectorExpressions.normalizeFloat(col("v")).as("n"))
      .collect().map(_.getSeq[Double](0))
    assert(rows(0) == Seq(0.6, 0.8))
    assert(rows(1) == Seq(0.0, 0.0))
  }

  test("intersectCardinality counts like array_intersect without materializing") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.graft.VectorExpressions
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L)),
      (Array.empty[Long], Array(1L)),
      (Array(7L), Array(8L)))
      .toDF("a", "b")
    val out = df.select(
      VectorExpressions.intersectCardinality(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("intersectCardinality survives adversarial clustered keys") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.graft.VectorExpressions
    // sequential and power-of-two-stride keys stress open addressing
    val a = (0L until 1000L).toArray
    val b = (500L until 1500L).toArray
    val df = Seq((a, b)).toDF("a", "b")
    val n = df.select(VectorExpressions.intersectCardinality(col("a"), col("b")))
      .collect()(0).getInt(0)
    assert(n == 500)
  }

  test("kmv_sketch/kmv_estimate on the SQL surface equal the Column " +
      "operator's sketches") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val df = (1L to 500L).map(i => (if (i % 2 == 0) "a" else "b", i))
      .toDF("seg", "key")
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      """SELECT seg, kmv_sketch(CAST(key AS STRING)) AS kmv,
        |       kmv_estimate(kmv_sketch(CAST(key AS STRING))) AS est
        |FROM kmv_in GROUP BY seg""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1).toSeq, r.getDouble(2)))).toMap
    val viaOp = graft.operators.Kmv.sketch(df, Seq("seg"), "key", 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaSql.keySet == Set("a", "b"))
    viaOp.foreach { case (seg, sk) =>
      assert(viaSql(seg)._1 == sk, s"seg=$seg")
      assert(viaSql(seg)._2 ==
        graft.operators.Kmv.estimateValue(sk.toArray, 32))
    }
    // partitioning never changes a sketch (merge = union rule)
    val repart = df.repartition(13)
    repart.createOrReplaceTempView("kmv_in2")
    val again = spark.sql(
      "SELECT seg, kmv_sketch(CAST(key AS STRING)) AS kmv FROM kmv_in2 GROUP BY seg")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(again == viaOp.map { case (k, v) => k -> v })
  }
}
