package graft.functions

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Minimal pure-JVM ONNX runtime for config-declared model UDFs — the
  * reference's ONNX UDF surface (dozer-types/src/models/udf_config.rs:16-26
  * `UdfType::Onnx { path }`; dozer-sql/expression/src/onnx/udf.rs
  * `evaluate_onnx_udf`: scalar args assembled into the model's single
  * input tensor, session run, first output value returned as the scalar
  * result). The reference links onnxruntime; this container has no ML
  * jars and zero egress, so graft ships a self-contained subset:
  *
  *   - a hand-rolled protobuf *wire-format* reader/writer (varint +
  *     length-delimited messages — no protobuf-java dependency) for the
  *     ONNX `ModelProto` fields we need (graph, nodes, initializers,
  *     input/output value infos);
  *   - a feed-forward interpreter covering the MLP op set (Gemm, MatMul,
  *     Add, Sub, Mul, Relu, Sigmoid, Tanh, Softmax, Flatten, Identity,
  *     ArgMax) — enough for the classifier/scorer models the reference
  *     runs on column batches.
  *
  * Scale shape: the model is parsed ONCE on the driver (model-sized,
  * like the IVF centroids or the BPE merge table), captured by a plain
  * Scala UDF closure, and broadcast with the task — inference is
  * map-only, no shuffle, no per-row allocation beyond the activations.
  * Deliberately NOT a Catalyst expression: matrix math dominates, so
  * codegen would buy nothing over the JIT'd loops.
  *
  * Numerics: all math is Float32, matching onnxruntime's default f32
  * kernels (the reference warns "Precision loss is expected due to
  * conversion to f32" — udf.rs:69). Models whose weights and inputs are
  * integer-valued stay EXACT in f32 below 2^24, which is what lets an
  * inference query hash-match a DuckDB integer replay (q85).
  */
object OnnxMini extends Serializable {

  // ---- model ------------------------------------------------------------

  /** Row-major tensor. `dims` may carry -1 for the dynamic batch axis of
    * graph inputs; concrete tensors always have concrete dims.
    */
  final case class Tensor(dims: Array[Int], data: Array[Float]) {
    def rows: Int = if (dims.length >= 2) dims(dims.length - 2) else 1
    def cols: Int = dims.last
  }

  final case class Attr(name: String, i: Long = 0L, f: Float = 0f,
      ints: Seq[Long] = Nil)

  final case class Node(op: String, inputs: Seq[String],
      outputs: Seq[String], attrs: Map[String, Attr]) {
    def attrI(name: String, dflt: Long): Long =
      attrs.get(name).map(_.i).getOrElse(dflt)
    def attrF(name: String, dflt: Float): Float =
      attrs.get(name).map(_.f).getOrElse(dflt)
  }

  /** Parsed graph: single input / single output (the reference's UDF
    * contract — udf.rs indexes `session.inputs[0]` / `outputs[0]`).
    */
  final case class Model(inputName: String, inputDims: Array[Int],
      outputName: String, init: Map[String, Tensor], nodes: Seq[Node]) {
    /** Flattened per-record input width (batch axis excluded). */
    def inputWidth: Int = inputDims.filter(_ > 0).product
  }

  // ---- protobuf wire reader ---------------------------------------------

  private final class Rd(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def sub(): Rd = {
      val n = varint().toInt
      val r = new Rd(buf, pos, pos + n); pos += n; r
    }
    def str(): String = {
      val n = varint().toInt
      val s = new String(buf, pos, n, java.nio.charset.StandardCharsets.UTF_8)
      pos += n; s
    }
    def rawLen(): Int = varint().toInt
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 =>
        // NB: must read the length BEFORE touching pos — `pos += varint()`
        // would capture the pre-varint pos and lose the length bytes
        val n = varint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(
        s"onnx: wire type $w at pos $pos/$end")
    }
  }

  /** Parse ONNX `ModelProto` bytes (the subset graft executes). Unknown
    * fields are skipped wire-correctly, so models exported with extra
    * metadata (producer, opset imports, doc strings) still load.
    */
  def parse(bytes: Array[Byte]): Model = {
    var graph: Rd = null
    val m = new Rd(bytes, 0, bytes.length)
    while (m.hasNext) {
      val t = m.varint(); val field = (t >>> 3).toInt; val wire = (t & 7).toInt
      if (field == 7 && wire == 2) graph = m.sub() else m.skip(wire)
    }
    require(graph != null, "onnx: ModelProto has no graph (field 7)")

    val nodes = mutable.ArrayBuffer[Node]()
    val init = mutable.Map[String, Tensor]()
    var inputName = ""; var inputDims = Array[Int]()
    var outputName = ""
    val initNames = mutable.Set[String]()
    while (graph.hasNext) {
      val t = graph.varint()
      val field = (t >>> 3).toInt; val wire = (t & 7).toInt
      field match {
        case 1 => nodes += parseNode(graph.sub())
        case 5 =>
          val tn = parseTensor(graph.sub()); init(tn._1) = tn._2
          initNames += tn._1
        case 11 =>
          val (n, dims) = parseValueInfo(graph.sub())
          // graph.input lists initializers too in some exporters; the
          // model input is the first input that is NOT an initializer.
          if (inputName.isEmpty && !initNames.contains(n)) {
            inputName = n; inputDims = dims
          }
        case 12 =>
          val (n, _) = parseValueInfo(graph.sub())
          if (outputName.isEmpty) outputName = n
        case _ => graph.skip(wire)
      }
    }
    require(inputName.nonEmpty, "onnx: graph has no input value info")
    require(outputName.nonEmpty, "onnx: graph has no output value info")
    Model(inputName, inputDims, outputName, init.toMap, nodes.toSeq)
  }

  private def parseNode(r: Rd): Node = {
    val ins = mutable.ArrayBuffer[String]()
    val outs = mutable.ArrayBuffer[String]()
    var op = ""
    val attrs = mutable.Map[String, Attr]()
    while (r.hasNext) {
      val t = r.varint(); val field = (t >>> 3).toInt; val wire = (t & 7).toInt
      field match {
        case 1 => ins += r.str()
        case 2 => outs += r.str()
        case 4 => op = r.str()
        case 5 =>
          val a = parseAttr(r.sub()); attrs(a.name) = a
        case _ => r.skip(wire)
      }
    }
    Node(op, ins.toSeq, outs.toSeq, attrs.toMap)
  }

  private def parseAttr(r: Rd): Attr = {
    var name = ""; var i = 0L; var f = 0f
    val ints = mutable.ArrayBuffer[Long]()
    while (r.hasNext) {
      val t = r.varint(); val field = (t >>> 3).toInt; val wire = (t & 7).toInt
      field match {
        case 1 => name = r.str()
        case 2 => f = java.lang.Float.intBitsToFloat(r.fixed32())
        case 3 => i = r.varint()
        case 8 =>
          if (wire == 2) { // packed
            val s = r.sub(); while (s.hasNext) ints += s.varint()
          } else ints += r.varint()
        case _ => r.skip(wire)
      }
    }
    Attr(name, i, f, ints.toSeq)
  }

  /** TensorProto: dims(1), data_type(2), float_data(4 packed f32),
    * int64_data(7), name(8), raw_data(9, little-endian). Float32 (type
    * 1) and Int64 (type 7, widened to f32) initializers are supported.
    */
  private def parseTensor(r: Rd): (String, Tensor) = {
    val dims = mutable.ArrayBuffer[Int]()
    var dtype = 1; var name = ""
    var floats: Array[Float] = null
    var raw: Array[Byte] = null
    val longs = mutable.ArrayBuffer[Long]()
    while (r.hasNext) {
      val t = r.varint(); val field = (t >>> 3).toInt; val wire = (t & 7).toInt
      field match {
        case 1 =>
          if (wire == 2) { val s = r.sub(); while (s.hasNext) dims += s.varint().toInt }
          else dims += r.varint().toInt
        case 2 => dtype = r.varint().toInt
        case 4 =>
          if (wire == 2) {
            val s = r.sub(); val fb = mutable.ArrayBuffer[Float]()
            while (s.hasNext) fb += java.lang.Float.intBitsToFloat(s.fixed32())
            floats = fb.toArray
          } else floats = Array(java.lang.Float.intBitsToFloat(r.fixed32()))
        case 7 =>
          if (wire == 2) { val s = r.sub(); while (s.hasNext) longs += s.varint() }
          else longs += r.varint()
        case 8 => name = r.str()
        case 9 =>
          val n = r.rawLen()
          raw = java.util.Arrays.copyOfRange(r.buf, r.pos, r.pos + n)
          r.pos += n
        case _ => r.skip(wire)
      }
    }
    val data: Array[Float] =
      if (floats != null) floats
      else if (longs.nonEmpty) longs.map(_.toFloat).toArray
      else if (raw != null) dtype match {
        case 1 =>
          val bb = java.nio.ByteBuffer.wrap(raw)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          Array.fill(raw.length / 4)(bb.getFloat())
        case 7 =>
          val bb = java.nio.ByteBuffer.wrap(raw)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          Array.fill(raw.length / 8)(bb.getLong().toFloat)
        case d => throw new IllegalArgumentException(
          s"onnx: unsupported raw_data dtype $d for tensor '$name'")
      }
      else Array.empty[Float]
    (name, Tensor(if (dims.isEmpty) Array(data.length) else dims.toArray, data))
  }

  /** ValueInfoProto → (name, dims); dim_param / absent → -1 (dynamic). */
  private def parseValueInfo(r: Rd): (String, Array[Int]) = {
    var name = ""; var dims = Array[Int]()
    while (r.hasNext) {
      val t = r.varint(); val field = (t >>> 3).toInt; val wire = (t & 7).toInt
      field match {
        case 1 => name = r.str()
        case 2 =>
          val tp = r.sub()
          while (tp.hasNext) {
            val tt = tp.varint()
            if ((tt >>> 3).toInt == 1 && (tt & 7).toInt == 2) {
              val tensorType = tp.sub()
              while (tensorType.hasNext) {
                val t3 = tensorType.varint()
                if ((t3 >>> 3).toInt == 2 && (t3 & 7).toInt == 2) {
                  val shape = tensorType.sub()
                  val db = mutable.ArrayBuffer[Int]()
                  while (shape.hasNext) {
                    val t4 = shape.varint()
                    if ((t4 >>> 3).toInt == 1 && (t4 & 7).toInt == 2) {
                      val dim = shape.sub(); var v = -1
                      while (dim.hasNext) {
                        val t5 = dim.varint()
                        if ((t5 >>> 3).toInt == 1 && (t5 & 7).toInt == 0)
                          v = dim.varint().toInt
                        else dim.skip((t5 & 7).toInt)
                      }
                      db += v
                    } else shape.skip((t4 & 7).toInt)
                  }
                  dims = db.toArray
                } else tensorType.skip((t3 & 7).toInt)
              }
            } else tp.skip((tt & 7).toInt)
          }
        case _ => r.skip(wire)
      }
    }
    (name, dims)
  }

  // ---- interpreter ------------------------------------------------------

  /** Run the graph on one feed tensor. Nodes are evaluated in file order
    * (ONNX requires graphs be topologically sorted). Returns the graph
    * output tensor.
    */
  def run(model: Model, input: Tensor): Tensor = {
    val env = mutable.Map[String, Tensor]() ++= model.init
    env(model.inputName) = input
    for (n <- model.nodes) {
      def in(i: Int): Tensor = env.getOrElse(n.inputs(i),
        throw new IllegalArgumentException(
          s"onnx: ${n.op} input '${n.inputs(i)}' not computed"))
      val out: Tensor = n.op match {
        case "MatMul" => matmul(in(0), in(1), false, false, 1f)
        case "Gemm" =>
          val y = matmul(in(0), in(1),
            n.attrI("transA", 0) != 0, n.attrI("transB", 0) != 0,
            n.attrF("alpha", 1f))
          if (n.inputs.length > 2) addBias(y, in(2), n.attrF("beta", 1f)) else y
        case "Add" => zipOp(in(0), in(1), _ + _)
        case "Sub" => zipOp(in(0), in(1), _ - _)
        case "Mul" => zipOp(in(0), in(1), _ * _)
        case "Relu" => mapOp(in(0), v => if (v > 0f) v else 0f)
        case "Sigmoid" => mapOp(in(0), v => (1.0 / (1.0 + math.exp(-v.toDouble))).toFloat)
        case "Tanh" => mapOp(in(0), v => math.tanh(v.toDouble).toFloat)
        case "Identity" => in(0)
        case "Flatten" =>
          val t = in(0); Tensor(Array(t.rows, t.data.length / t.rows), t.data)
        case "Softmax" => softmax(in(0))
        case "ArgMax" => argmax(in(0), n.attrI("axis", 0).toInt,
          n.attrI("keepdims", 1) != 0)
        case op => throw new IllegalArgumentException(
          s"onnx: unsupported op '$op' (graft's runtime covers the MLP " +
            "set: Gemm/MatMul/Add/Sub/Mul/Relu/Sigmoid/Tanh/Softmax/" +
            "Flatten/Identity/ArgMax)")
      }
      env(n.outputs.head) = out
    }
    env.getOrElse(model.outputName, throw new IllegalArgumentException(
      s"onnx: graph output '${model.outputName}' never produced"))
  }

  private def matmul(a: Tensor, b: Tensor, tA: Boolean, tB: Boolean,
      alpha: Float): Tensor = {
    val (m, k) = if (tA) (a.cols, a.rows) else (a.rows, a.cols)
    val (k2, nn) = if (tB) (b.cols, b.rows) else (b.rows, b.cols)
    require(k == k2, s"onnx: matmul shape (${a.rows}x${a.cols})·(${b.rows}x${b.cols})")
    val out = new Array[Float](m * nn)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < nn) {
        var s = 0f; var t = 0
        while (t < k) {
          val av = if (tA) a.data(t * m + i) else a.data(i * k + t)
          val bv = if (tB) b.data(j * k2 + t) else b.data(t * nn + j)
          s += av * bv; t += 1
        }
        out(i * nn + j) = alpha * s; j += 1
      }
      i += 1
    }
    Tensor(Array(m, nn), out)
  }

  private def addBias(y: Tensor, c: Tensor, beta: Float): Tensor = {
    val out = y.data.clone()
    val n = y.cols
    var i = 0
    while (i < out.length) {
      out(i) += beta * c.data(if (c.data.length == out.length) i else i % n)
      i += 1
    }
    Tensor(y.dims, out)
  }

  private def zipOp(a: Tensor, b: Tensor, f: (Float, Float) => Float): Tensor = {
    val out = new Array[Float](a.data.length)
    val bn = b.data.length
    var i = 0
    while (i < out.length) { // equal shape, or broadcast b over the last axis
      out(i) = f(a.data(i), b.data(if (bn == out.length) i else i % bn))
      i += 1
    }
    Tensor(a.dims, out)
  }

  private def mapOp(a: Tensor, f: Float => Float): Tensor = {
    val out = new Array[Float](a.data.length)
    var i = 0
    while (i < out.length) { out(i) = f(a.data(i)); i += 1 }
    Tensor(a.dims, out)
  }

  private def softmax(a: Tensor): Tensor = {
    val n = a.cols; val out = new Array[Float](a.data.length)
    var r = 0
    while (r < a.data.length / n) {
      val off = r * n
      var mx = Float.NegativeInfinity
      var j = 0
      while (j < n) { if (a.data(off + j) > mx) mx = a.data(off + j); j += 1 }
      var sum = 0.0
      j = 0
      while (j < n) {
        val e = math.exp((a.data(off + j) - mx).toDouble)
        out(off + j) = e.toFloat; sum += e; j += 1
      }
      j = 0
      while (j < n) { out(off + j) = (out(off + j) / sum).toFloat; j += 1 }
      r += 1
    }
    Tensor(a.dims, out)
  }

  /** ONNX ArgMax (select_last_index=0): first index of the max along
    * `axis`. Only the last axis of a 2-D tensor is needed for the
    * classifier head shape [batch, classes].
    */
  private def argmax(a: Tensor, axis: Int, keepdims: Boolean): Tensor = {
    val n = a.cols
    require(axis == 1 || axis == -1 || a.dims.length == 1,
      s"onnx: ArgMax axis $axis unsupported for dims ${a.dims.mkString("x")}")
    val rows = a.data.length / n
    val out = new Array[Float](rows)
    var r = 0
    while (r < rows) {
      var best = 0; var j = 1
      while (j < n) {
        if (a.data(r * n + j) > a.data(r * n + best)) best = j
        j += 1
      }
      out(r) = best.toFloat; r += 1
    }
    Tensor(if (keepdims) Array(rows, 1) else Array(rows), out)
  }

  // ---- encoder (model builder) ------------------------------------------

  /** Protobuf wire writer — enough to EMIT the models the parser reads.
    * Used by tests (round-trip property) and by graft itself to export
    * trained linear/MLP models as standard ONNX files other runtimes can
    * load.
    */
  private final class Wr {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length); out.write(b)
    }
    def strField(field: Int, s: String): Unit =
      bytesField(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def msgField(field: Int, w: Wr): Unit = bytesField(field, w.out.toByteArray)
  }

  private def tensorProto(name: String, dims: Array[Int],
      data: Array[Float]): Wr = {
    val w = new Wr
    dims.foreach(d => w.varintField(1, d.toLong))
    w.varintField(2, 1L) // FLOAT
    val packed = new Wr
    data.foreach(f => {
      val bits = java.lang.Float.floatToIntBits(f)
      packed.out.write(bits & 0xff); packed.out.write((bits >>> 8) & 0xff)
      packed.out.write((bits >>> 16) & 0xff); packed.out.write((bits >>> 24) & 0xff)
    })
    w.bytesField(4, packed.out.toByteArray)
    w.strField(8, name)
    w
  }

  private def valueInfoProto(name: String, dims: Array[Int]): Wr = {
    val shape = new Wr
    dims.foreach { d =>
      val dim = new Wr
      if (d > 0) dim.varintField(1, d.toLong) else dim.strField(2, "batch")
      shape.msgField(1, dim)
    }
    val tensorType = new Wr
    tensorType.varintField(1, 1L) // elem_type FLOAT
    tensorType.msgField(2, shape)
    val tp = new Wr
    tp.msgField(1, tensorType)
    val vi = new Wr
    vi.strField(1, name)
    vi.msgField(2, tp)
    vi
  }

  private def nodeProto(n: Node): Wr = {
    val w = new Wr
    n.inputs.foreach(w.strField(1, _))
    n.outputs.foreach(w.strField(2, _))
    w.strField(4, n.op)
    n.attrs.values.toSeq.sortBy(_.name).foreach { a =>
      val aw = new Wr
      aw.strField(1, a.name)
      if (a.f != 0f) { aw.tag(2, 5)
        val bits = java.lang.Float.floatToIntBits(a.f)
        aw.out.write(bits & 0xff); aw.out.write((bits >>> 8) & 0xff)
        aw.out.write((bits >>> 16) & 0xff); aw.out.write((bits >>> 24) & 0xff)
      }
      if (a.i != 0L) aw.varintField(3, a.i)
      a.ints.foreach(aw.varintField(8, _))
      w.msgField(5, aw)
    }
    w
  }

  /** Serialize a [[Model]] as ONNX `ModelProto` bytes (ir_version 8,
    * opset ai.onnx:13 — the plain MLP ops are stable across opsets).
    */
  def encode(model: Model): Array[Byte] = {
    val g = new Wr
    model.nodes.foreach(n => g.msgField(1, nodeProto(n)))
    g.strField(2, "graft")
    model.init.toSeq.sortBy(_._1).foreach { case (n, t) =>
      g.msgField(5, tensorProto(n, t.dims, t.data))
    }
    g.msgField(11, valueInfoProto(model.inputName, model.inputDims))
    g.msgField(12, valueInfoProto(model.outputName, Array(-1)))
    val m = new Wr
    m.varintField(1, 8L) // ir_version
    val opset = new Wr
    opset.strField(1, "") // default ai.onnx domain
    opset.varintField(2, 13L)
    m.msgField(8, opset)
    m.msgField(7, g)
    m.out.toByteArray
  }

  // ---- Spark surface ----------------------------------------------------

  /** Dozer's UDF evaluation contract (udf.rs): flatten the args into the
    * model's input tensor (batch 1), run, return the FIRST value of the
    * first output as a double.
    */
  def scalar(model: Model, args: Array[Float]): Double = {
    val w = model.inputWidth
    require(args.length == w,
      s"onnx: model expects $w inputs, got ${args.length}")
    run(model, Tensor(Array(1, w), args)).data(0).toDouble
  }

  /** Read model bytes through the Hadoop FileSystem API — works for
    * local paths AND hdfs://, s3a://, etc. (the 100 TB production
    * shape; same fix as the IVF centroids).
    */
  def loadBytes(spark: SparkSession, path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  /** Register the model as session UDFs:
    *   - `name(x1, x2, …, xN)` — the reference's scalar call shape
    *     (one DOUBLE arg per input dim), for models with ≤ 10 inputs;
    *   - `name_vec(array<float>)` — the columnar call shape for wide
    *     inputs (embeddings).
    * The parsed model is driver-resident and ships to executors inside
    * the UDF closure (model-sized: KBs for an MLP head).
    */
  def register(spark: SparkSession, name: String, model: Model): Unit = {
    import org.apache.spark.sql.functions.udf
    val vecUdf = udf((xs: Seq[Float]) => scalar(model, xs.toArray))
    spark.udf.register(name + "_vec", vecUdf)
    val w = model.inputWidth
    def a(xs: Double*): Double = scalar(model, xs.map(_.toFloat).toArray)
    if (w <= 10) {
      val f = w match {
        case 1 => udf((x1: Double) => a(x1))
        case 2 => udf((x1: Double, x2: Double) => a(x1, x2))
        case 3 => udf((x1: Double, x2: Double, x3: Double) => a(x1, x2, x3))
        case 4 => udf((x1: Double, x2: Double, x3: Double, x4: Double) => a(x1, x2, x3, x4))
        case 5 => udf((x1: Double, x2: Double, x3: Double, x4: Double, x5: Double) => a(x1, x2, x3, x4, x5))
        case 6 => udf((x1: Double, x2: Double, x3: Double, x4: Double, x5: Double, x6: Double) => a(x1, x2, x3, x4, x5, x6))
        case 7 => udf((x1: Double, x2: Double, x3: Double, x4: Double, x5: Double, x6: Double, x7: Double) => a(x1, x2, x3, x4, x5, x6, x7))
        case 8 => udf((x1: Double, x2: Double, x3: Double, x4: Double, x5: Double, x6: Double, x7: Double, x8: Double) => a(x1, x2, x3, x4, x5, x6, x7, x8))
        case 9 => udf((x1: Double, x2: Double, x3: Double, x4: Double, x5: Double, x6: Double, x7: Double, x8: Double, x9: Double) => a(x1, x2, x3, x4, x5, x6, x7, x8, x9))
        case _ => udf((x1: Double, x2: Double, x3: Double, x4: Double, x5: Double, x6: Double, x7: Double, x8: Double, x9: Double, x10: Double) => a(x1, x2, x3, x4, x5, x6, x7, x8, x9, x10))
      }
      spark.udf.register(name, f)
    }
  }

  /** Config entry point: load + parse + register (`udfs:` with
    * `config: { path: model.onnx }`, udf_config.rs `UdfType::Onnx`).
    */
  def registerFromPath(spark: SparkSession, name: String, path: String): Unit =
    register(spark, name, parse(loadBytes(spark, path)))
}
