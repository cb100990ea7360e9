package graft.functions

import OnnxMini.{Model, Node, Attr, Tensor}

/** Concrete ONNX models graft ships/builds.
  *
  * [[q85Model]] is the oracled-inference model: a 64→16→8 MLP classifier
  * head whose weights are small INTEGERS from a closed-form rule, so
  * that over integer (SQ8-quantized) inputs every activation is an
  * integer far below 2^24 — f32 inference is then bit-exact and a DuckDB
  * integer replay of the same network hash-matches the Spark result
  * (query q85). The graph is real ONNX (Gemm → Relu → Gemm → ArgMax),
  * byte-encoded and re-parsed through the wire format on every use, so
  * the query also exercises the protobuf round-trip.
  */
object OnnxModels {
  val Dim = 64
  val Hidden = 16
  val Classes = 8

  /** w1[i][j] = ((i*7 + j*3) mod 5) - 2, row-major [Dim, Hidden]. */
  def w1(i: Int, j: Int): Int = ((i * 7 + j * 3) % 5) - 2
  /** b1[j] = (j mod 3) - 1. */
  def b1(j: Int): Int = (j % 3) - 1
  /** w2[j][k] = ((j*5 + k*11) mod 7) - 3, row-major [Hidden, Classes]. */
  def w2(j: Int, k: Int): Int = ((j * 5 + k * 11) % 7) - 3

  def q85Model: Model = {
    val w1d = Array.tabulate(Dim * Hidden)(x => w1(x / Hidden, x % Hidden).toFloat)
    val b1d = Array.tabulate(Hidden)(b1(_).toFloat)
    val w2d = Array.tabulate(Hidden * Classes)(x => w2(x / Classes, x % Classes).toFloat)
    Model(
      inputName = "x", inputDims = Array(-1, Dim), outputName = "label",
      init = Map(
        "w1" -> Tensor(Array(Dim, Hidden), w1d),
        "b1" -> Tensor(Array(Hidden), b1d),
        "w2" -> Tensor(Array(Hidden, Classes), w2d)),
      nodes = Seq(
        Node("Gemm", Seq("x", "w1", "b1"), Seq("h0"), Map.empty),
        Node("Relu", Seq("h0"), Seq("h"), Map.empty),
        Node("MatMul", Seq("h", "w2"), Seq("logits"), Map.empty),
        Node("ArgMax", Seq("logits"), Seq("label"),
          Map("axis" -> Attr("axis", i = 1L)))))
  }

  /** The model as standard ONNX file bytes. */
  def q85Bytes: Array[Byte] = OnnxMini.encode(q85Model)
}
