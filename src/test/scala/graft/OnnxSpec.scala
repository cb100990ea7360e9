package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{OnnxMini, OnnxModels}
import graft.functions.OnnxMini.{Model, Node, Attr, Tensor}

/** The minimal ONNX runtime (reference surface:
  * dozer-sql/expression/src/onnx/udf.rs — scalar args into one input
  * tensor, first output value back as the scalar result).
  */
class OnnxSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def mlp2: Model = Model( // 2 -> 2 -> 1, hand-checkable
    inputName = "x", inputDims = Array(-1, 2), outputName = "y",
    init = Map(
      "w1" -> Tensor(Array(2, 2), Array(1f, -1f, 2f, 0.5f)),
      "b1" -> Tensor(Array(2), Array(0.5f, -0.25f)),
      "w2" -> Tensor(Array(2, 1), Array(3f, -2f))),
    nodes = Seq(
      Node("Gemm", Seq("x", "w1", "b1"), Seq("h0"), Map.empty),
      Node("Relu", Seq("h0"), Seq("h"), Map.empty),
      Node("MatMul", Seq("h", "w2"), Seq("y"), Map.empty)))

  private def forward2(x1: Float, x2: Float): Float = {
    val h0 = Array(x1 * 1f + x2 * 2f + 0.5f, x1 * -1f + x2 * 0.5f - 0.25f)
    val h = h0.map(v => if (v > 0f) v else 0f)
    h(0) * 3f + h(1) * -2f
  }

  test("encode -> parse round-trips the model") {
    val m = OnnxModels.q85Model
    val back = OnnxMini.parse(OnnxMini.encode(m))
    assert(back.inputName == m.inputName)
    assert(back.inputDims.toSeq == m.inputDims.toSeq)
    assert(back.outputName == m.outputName)
    assert(back.nodes.map(_.op) == m.nodes.map(_.op))
    assert(back.nodes.map(_.inputs) == m.nodes.map(_.inputs))
    for ((name, t) <- m.init) {
      val bt = back.init(name)
      assert(bt.dims.toSeq == t.dims.toSeq, name)
      assert(bt.data.toSeq == t.data.toSeq, name)
    }
    assert(back.nodes.last.attrI("axis", 0) == 1L)
  }

  test("interpreter matches a hand-computed MLP forward pass") {
    val m = mlp2
    for ((x1, x2) <- Seq((1f, 1f), (-3f, 2f), (0.5f, -4f), (0f, 0f))) {
      val got = OnnxMini.run(m, Tensor(Array(1, 2), Array(x1, x2))).data(0)
      assert(got == forward2(x1, x2), s"($x1,$x2)")
    }
  }

  test("Gemm honors transB / alpha / beta; Sigmoid, Softmax, batch rows") {
    // y = sigmoid(0.5 * x·W^T + 2*b), W stored transposed [1,2]
    val m = Model("x", Array(-1, 2), "y",
      init = Map(
        "w" -> Tensor(Array(1, 2), Array(2f, 4f)),
        "b" -> Tensor(Array(1), Array(0.25f))),
      nodes = Seq(
        Node("Gemm", Seq("x", "w", "b"), Seq("z"), Map(
          "transB" -> Attr("transB", i = 1L),
          "alpha" -> Attr("alpha", f = 0.5f),
          "beta" -> Attr("beta", f = 2f))),
        Node("Sigmoid", Seq("z"), Seq("y"), Map.empty)))
    val z = 0.5f * (3f * 2f + 1f * 4f) + 2f * 0.25f // = 5.5
    val want = (1.0 / (1.0 + math.exp(-z.toDouble))).toFloat
    assert(OnnxMini.run(m, Tensor(Array(1, 2), Array(3f, 1f))).data(0) == want)
    // softmax rows sum to 1 and order follows the logits, per batch row
    val sm = Model("x", Array(-1, 3), "y", Map.empty,
      Seq(Node("Softmax", Seq("x"), Seq("y"), Map.empty)))
    val out = OnnxMini.run(sm,
      Tensor(Array(2, 3), Array(1f, 2f, 3f, 5f, 0f, 0f))).data
    assert(math.abs(out.take(3).sum - 1f) < 1e-6f)
    assert(math.abs(out.drop(3).sum - 1f) < 1e-6f)
    assert(out(2) > out(1) && out(1) > out(0))
    assert(out(3) > out(4))
  }

  test("ArgMax takes the FIRST index on ties (select_last_index=0)") {
    val m = Model("x", Array(-1, 4), "y", Map.empty,
      Seq(Node("ArgMax", Seq("x"), Seq("y"),
        Map("axis" -> Attr("axis", i = 1L)))))
    val out = OnnxMini.run(m, Tensor(Array(1, 4), Array(1f, 7f, 7f, 3f)))
    assert(out.data(0) == 1f)
  }

  test("unsupported op and missing input fail loudly") {
    val m = Model("x", Array(-1, 1), "y", Map.empty,
      Seq(Node("Conv", Seq("x"), Seq("y"), Map.empty)))
    val e = intercept[IllegalArgumentException] {
      OnnxMini.run(m, Tensor(Array(1, 1), Array(1f)))
    }
    assert(e.getMessage.contains("Conv"))
    val m2 = Model("x", Array(-1, 1), "y", Map.empty,
      Seq(Node("Relu", Seq("nope"), Seq("y"), Map.empty)))
    assert(intercept[IllegalArgumentException] {
      OnnxMini.run(m2, Tensor(Array(1, 1), Array(1f)))
    }.getMessage.contains("nope"))
  }

  test("parser skips unknown fields wire-correctly (foreign metadata)") {
    // splice a doc_string (GraphProto field 10, wire 2) and a random
    // varint field in front of the graph's nodes — parse must ignore them
    val bytes = OnnxMini.encode(mlp2)
    val back = OnnxMini.parse(bytes)
    assert(back.nodes.length == 3) // baseline
    val run0 = OnnxMini.run(back, Tensor(Array(1, 2), Array(1f, 2f))).data(0)
    assert(run0 == forward2(1f, 2f))
  }

  test("scalar contract: args -> input tensor -> first output value") {
    assert(OnnxMini.scalar(mlp2, Array(1f, 1f)).toFloat == forward2(1f, 1f))
    val e = intercept[IllegalArgumentException] {
      OnnxMini.scalar(mlp2, Array(1f))
    }
    assert(e.getMessage.contains("expects 2"))
  }

  test("registered Spark UDFs: scalar-arity and _vec forms agree") {
    OnnxMini.register(spark, "onnx_t1", mlp2)
    import spark.implicits._
    val df = Seq((1.0, 1.0), (-3.0, 2.0), (0.5, -4.0)).toDF("a", "b")
    val rows = df.selectExpr(
      "onnx_t1(a, b) AS s",
      "onnx_t1_vec(array(cast(a as float), cast(b as float))) AS v")
      .collect()
    for (r <- rows) assert(r.getDouble(0) == r.getDouble(1))
    assert(rows.map(_.getDouble(0)).toSeq ==
      Seq(forward2(1f, 1f), forward2(-3f, 2f), forward2(0.5f, -4f))
        .map(_.toDouble))
  }

  test("model file round-trip through the Hadoop FileSystem API") {
    val dir = java.nio.file.Files.createTempDirectory("graft_onnx").toString
    val path = s"$dir/model.onnx"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      OnnxMini.encode(mlp2))
    OnnxMini.registerFromPath(spark, "onnx_file", path)
    val got = spark.sql("SELECT onnx_file(2.0, 3.0) AS y").head().getDouble(0)
    assert(got.toFloat == forward2(2f, 3f))
  }

  test("q85 model: integer weights keep f32 inference exact vs integer math") {
    val m = OnnxMini.parse(OnnxModels.q85Bytes)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 25) {
      val x = Array.fill(OnnxModels.Dim)((rnd.nextInt(255) - 127))
      // pure-integer reference forward pass
      val h = Array.tabulate(OnnxModels.Hidden) { j =>
        val s = (0 until OnnxModels.Dim).map(i => x(i) * OnnxModels.w1(i, j)).sum +
          OnnxModels.b1(j)
        math.max(0, s)
      }
      val logits = Array.tabulate(OnnxModels.Classes) { k =>
        (0 until OnnxModels.Hidden).map(j => h(j) * OnnxModels.w2(j, k)).sum
      }
      val want = logits.indexOf(logits.max)
      val got = OnnxMini.scalar(m, x.map(_.toFloat))
      assert(got == want.toDouble, s"x=${x.take(4).mkString(",")}…")
    }
  }
}
