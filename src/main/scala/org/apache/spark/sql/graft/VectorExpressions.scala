package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Σ aᵢ·bᵢ over two FLOAT vectors, each element widened to double before
  * the multiply and accumulated strictly left-to-right — the EXACT value
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, +)`
  * produces, but as one codegen'd loop instead of per-element interpreted
  * lambda dispatch. Dot products are the inner loop of every similarity/
  * ANN path; at corpus scale the lambda interpreter IS the budget. */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatVecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.FloatVecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    // SQL-registered: truncating to the shorter side would return a
    // plausible-but-wrong product on mismatched inputs — fail loudly
    require(a.numElements() == b.numElements(),
      s"fvec_dot: vector lengths differ (${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** Σ aᵢ·bᵢ over two DOUBLE vectors, accumulated strictly left-to-right —
  * the same sequential fold DuckDB's `list_dot_product` over DOUBLE[]
  * applies, which is what lets double-precision cosine queries (e.g.
  * vector-vs-centroid cohesion) hash-match the oracle exactly. */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DoubleVecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.DoubleVecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)
}

object DoubleVecDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    // same contract as fvec_dot: mismatched lengths error, never truncate
    require(a.numElements() == b.numElements(),
      s"dvec_dot: vector lengths differ (${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** Sign-LSH sketch of a FLOAT vector: bit p = sign(<v, h_p>) for `planes`
  * deterministic ±1 hyperplanes (a fixed integer mix of (p, d) — identical
  * on every executor with zero driver state). Replaces a planes×dim
  * unrolled Column expression whose generated source took seconds to
  * janino-compile; here the generated code is one static call. */
case class SignSketch(child: Expression, planes: Int = 8,
                      planeOffset: Int = 0)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_sketch"

  override protected def nullSafeEval(input: Any): Any =
    SignSketch.sketch(input.asInstanceOf[ArrayData], planes, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SignSketch.sketch($c, $planes, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): SignSketch =
    copy(child = newChild)
}

/** Int8 symmetric scalar quantization of a FLOAT vector in ONE pass:
  * struct(scale = max|x|/127, qvec[i] = round_half_up(x_i·127/max|x|)).
  * NULL when max|x| = 0 (zero vectors don't quantize). Replaces an
  * array_max(transform(abs)) + transform(round) Column pair — two
  * interpreted per-element lambda passes over every component of the
  * corpus. Rounding is half-away-from-zero computed on the exact binary
  * double (≡ C round ≡ DuckDB round ≡ Catalyst round(d, 0) everywhere a
  * float-derived product can land). */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qvec", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  override protected def nullSafeEval(input: Any): Any =
    QuantizeInt8.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.QuantizeInt8.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Half-away-from-zero on the exact binary double (frac compare is exact
    * for |x| < 2^52 — both operands are ulp-aligned). */
  private def roundHalfUp(x: Double): Int = {
    val ax = math.abs(x)
    val t = math.floor(ax)
    val r = if (ax - t >= 0.5) t + 1.0 else t
    (if (x < 0) -r else r).toInt
  }

  def compute(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > maxabs) maxabs = a
      i += 1
    }
    if (maxabs == 0.0) return null
    val q = new Array[Int](n)
    i = 0
    while (i < n) {
      q(i) = roundHalfUp(v.getFloat(i).toDouble * 127.0 / maxabs)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](maxabs / 127.0, new GenericArrayData(q)))
  }
}

object SignSketch {
  /** splitmix64-style mix of (plane, dim) → ±1. */
  private def sign(p: Int, d: Int): Double = {
    var z = p * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z ^= z >>> 31
    z *= 0xD6E8FEB86659FD93L
    z ^= z >>> 27
    if ((z & 1L) == 1L) 1.0 else -1.0
  }

  def sketch(v: ArrayData, planes: Int): Long = sketch(v, planes, 0)

  /** `planeOffset` selects a disjoint hyperplane family (plane indices
    * offset..offset+planes-1) so callers can stack several independent
    * 64-bit sketches — the wide-banding LSH trick. */
  def sketch(v: ArrayData, planes: Int, planeOffset: Int): Long = {
    val dim = v.numElements()
    var bits = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < dim) {
        proj += v.getFloat(d).toDouble * sign(planeOffset + p, d)
        d += 1
      }
      if (proj > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }
}
