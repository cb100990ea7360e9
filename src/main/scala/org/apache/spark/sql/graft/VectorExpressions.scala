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
