package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (ANN queries
  * rank O(corpus × queries) candidate pairs; the per-pair dot product
  * IS the workload).
  *
  * Spark's builtin formulation — `aggregate(zip_with(a, b, _*_), ...)`
  * — evaluates through interpreted higher-order functions: one closure
  * call + boxed accumulator per element per pair, outside whole-stage
  * codegen. [[DotProduct]] instead generates a primitive fused
  * multiply-add loop over the two `UnsafeArrayData` buffers directly
  * inside the WholeStageCodegen stage, like any builtin arithmetic.
  *
  * The single-pass array kernels ([[VectorKernels]]) are wired in as
  * `StaticInvoke` calls — the generated code invokes the static
  * forwarder without breaking the codegen span (same pattern as the geo
  * functions, reference dozer-sql/expression/src/geo/distance.rs).
  */
object VectorExpressions {

  /** Double-precision dot product of two array<double> columns (float
    * arrays are implicitly cast). NULL semantics match the
    * `aggregate(zip_with(...))` formulation this replaces: a null
    * array, a null element, or a length mismatch (zip_with pads the
    * shorter side with nulls) all yield NULL. Accumulation is
    * sequential in element order, so non-null results are
    * bitwise-identical to the interpreted formulation.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_product"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** `dot(a, b)` as a Column — codegen'd primitive loop. */
  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  /** Unit-normalize an array<float> column to array<double> in one
    * pass (sum of squares, sqrt, scale — same operation order as the
    * UDF it replaces, so outputs are bitwise-identical).
    */
  def normalizeFloat(v: Column): Column =
    GraftShims.column(StaticInvoke(
      VectorKernels.getClass,
      ArrayType(DoubleType, containsNull = false),
      "normalizeF",
      Seq(GraftShims.expression(v)),
      inputTypes = Seq(ArrayType(FloatType))))

  /** Count of positions where two array<bigint> columns agree —
    * the minhash signature-agreement estimator, one primitive loop per
    * candidate pair instead of interpreted zip_with/aggregate closures.
    */
  def positionalMatches(a: Column, b: Column): Column =
    GraftShims.column(StaticInvoke(
      VectorKernels.getClass,
      IntegerType,
      "positionalMatches",
      Seq(GraftShims.expression(a), GraftShims.expression(b)),
      inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))))

  /** Cardinality of the intersection of two array<bigint> columns
    * whose elements are distinct (e.g. hashed token sets) — counts
    * without materializing the intersection array.
    */
  def intersectCardinality(a: Column, b: Column): Column =
    GraftShims.column(StaticInvoke(
      VectorKernels.getClass,
      IntegerType,
      "intersectLongCount",
      Seq(GraftShims.expression(a), GraftShims.expression(b)),
      inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))))

  /** Symmetric int8 scalar quantization (SQ8), inspection form: each
    * component rounded (half away from zero, the SQL ROUND rule) to
    * `round(x · 127 / max|x|)` ∈ [-127, 127]. Integer output — exact
    * cross-engine, so SQ8 pipelines are fully oracle-checkable.
    */
  def sq8Codes(v: Column): Column =
    GraftShims.column(StaticInvoke(
      VectorKernels.getClass,
      ArrayType(IntegerType, containsNull = false),
      "sq8I",
      Seq(GraftShims.expression(v.cast("array<double>"))),
      inputTypes = Seq(ArrayType(DoubleType))))

  /** SQ8, storage form: the same codes packed one signed byte per
    * dimension — 4× smaller than the float embedding (the point of SQ8
    * at corpus scale: a 100 TB float corpus becomes 25 TB of codes).
    */
  def sq8Packed(v: Column): Column =
    GraftShims.column(StaticInvoke(
      VectorKernels.getClass,
      BinaryType,
      "sq8Bytes",
      Seq(GraftShims.expression(v.cast("array<double>"))),
      inputTypes = Seq(ArrayType(DoubleType))))

  /** Per-vector reconstruction scale `max|x| / 127`: component i
    * de-quantizes as `code(i) · scale`, with |error| ≤ scale/2.
    */
  def sq8Scale(v: Column): Column =
    GraftShims.column(StaticInvoke(
      VectorKernels.getClass,
      DoubleType,
      "sq8ScaleOf",
      Seq(GraftShims.expression(v.cast("array<double>"))),
      inputTypes = Seq(ArrayType(DoubleType))))

  /** Integer dot product of two packed-int8 code columns — the SQ8 ANN
    * scan kernel: a primitive signed-byte multiply-add loop (≤ 127²·dim
    * per pair, exact in an int for any dim < 133 000).
    */
  def dotInt8(a: Column, b: Column): Column =
    GraftShims.column(StaticInvoke(
      VectorKernels.getClass,
      IntegerType,
      "dotBytes",
      Seq(GraftShims.expression(a), GraftShims.expression(b)),
      inputTypes = Seq(BinaryType, BinaryType)))
}

/** Static kernels targeted by `StaticInvoke` — bodies run inside the
  * generated code's stage; no Scala-UDF encoder boundary.
  */
object VectorKernels {

  /** float[] → unit-norm double[]; zero vector passes through unscaled. */
  def normalizeF(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = v.getFloat(i).toDouble
      out(i) = d
      s += d * d
      i += 1
    }
    val norm = math.sqrt(s)
    if (norm != 0.0) {
      i = 0
      while (i < n) { out(i) /= norm; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Positions where two long arrays hold equal values. */
  def positionalMatches(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Quantization core: code_i = round((x_i · 127) / max|x|), half away
    * from zero decided EXACTLY via floor + remainder comparison (the
    * naive `floor(t + 0.5)` misrounds doubles like 0.49999999999999994
    * where the fp add crosses the half). Zero vectors quantize to all
    * zeros. Matches SQL `ROUND(x * 127.0 / ma)` bit-for-bit.
    */
  private def sq8Core(v: ArrayData): Array[Int] = {
    val n = v.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i)); if (a > ma) ma = a; i += 1
    }
    val out = new Array[Int](n)
    if (ma == 0.0) return out
    i = 0
    while (i < n) {
      val t = (v.getDouble(i) * 127.0) / ma
      val f = math.floor(t)
      val d = t - f
      out(i) = (if (d > 0.5 || (d == 0.5 && t >= 0)) f + 1.0 else f).toInt
      i += 1
    }
    out
  }

  /** array<double> → SQ8 codes as array<int> (inspection/oracle form). */
  def sq8I(v: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(sq8Core(v))

  /** array<double> → SQ8 codes packed one signed byte per dimension. */
  def sq8Bytes(v: ArrayData): Array[Byte] = {
    val codes = sq8Core(v)
    val out = new Array[Byte](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = codes(i).toByte; i += 1 }
    out
  }

  /** Reconstruction scale max|x| / 127 (0 for a zero vector). */
  def sq8ScaleOf(v: ArrayData): Double = {
    val n = v.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i)); if (a > ma) ma = a; i += 1
    }
    ma / 127.0
  }

  /** Exact integer dot product of two packed signed-int8 code buffers. */
  def dotBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var s = 0
    var i = 0
    while (i < n) { s += a(i).toInt * b(i).toInt; i += 1 }
    s
  }

  /** |A ∩ B| for two long arrays with distinct elements: open-address
    * hash of the smaller side, membership probes from the larger —
    * O(|A|+|B|), zero allocation beyond the probe table.
    */
  def intersectLongCount(a: ArrayData, b: ArrayData): Int = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0
    var cap = java.lang.Integer.highestOneBit(n) << 2 // load factor ≤ 0.5
    if (cap < 8) cap = 8
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    def slot(k: Long): Int = {
      // finalizer-style mix so clustered hash values spread over slots
      val h = k * -7046029254386353131L
      var idx = ((h ^ (h >>> 32)).toInt) & mask
      while (used(idx) && keys(idx) != k) idx = (idx + 1) & mask
      idx
    }
    var i = 0
    while (i < n) {
      val idx = slot(small.getLong(i))
      if (!used(idx)) { used(idx) = true; keys(idx) = small.getLong(i) }
      i += 1
    }
    var cnt = 0
    val m = big.numElements()
    i = 0
    while (i < m) {
      if (used(slot(big.getLong(i)))) cnt += 1
      i += 1
    }
    cnt
  }
}
