package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hilbert-curve key over a 2-element INT coordinate array — the
  * data-layout alternative to [[ZOrderKey]] with strictly better locality:
  * consecutive keys are always ADJACENT cells (Morton order jumps across
  * the grid at every power-of-two boundary), so range-partitioning by this
  * key gives per-file bounding boxes with smaller perimeter and better
  * min/max pruning on both columns. The standard xy2d bit-level descent
  * (Hamilton's / the public-domain formulation: per level, quadrant index
  * (3·rx)⊕ry scaled by s², then reflect-and-swap rotation of the frame)
  * at order 31 — keys span [0, 4³¹) and stay clear of the Long sign bit.
  *
  * Coordinates are masked to their low 31 bits (bit-identical to the
  * oracle's BIGINT `& 2147483647`), so negatives are deterministic, just
  * not order-preserving — same contract as ZOrderKey. A null element
  * nulls the key. Fixed 2-D: the classic curve; the n-D generalization is
  * a different algorithm, not a loop bound. */
case class HilbertKey(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(input: Any): Any =
    HilbertKey.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hk = ctx.freshName("hk")
      s"""
      java.lang.Long $hk = org.apache.spark.sql.graft.HilbertKey.compute($c);
      ${ev.isNull} = ($hk == null);
      ${ev.value} = ${ev.isNull} ? -1L : $hk.longValue();
    """
    })

  override protected def withNewChildInternal(newChild: Expression): HilbertKey =
    copy(child = newChild)
}

object HilbertKey {
  private val Mask = 0x7FFFFFFFL // low 31 bits; n-1 for the 2^31 grid

  /** Null-boxed so a null coordinate can null the whole key. */
  def compute(v: ArrayData): java.lang.Long = {
    require(v.numElements() == 2,
      s"hilbert_key: need exactly 2 dimensions, got ${v.numElements()}")
    if (v.isNullAt(0) || v.isNullAt(1)) return null
    var x = v.getInt(0).toLong & Mask
    var y = v.getInt(1).toLong & Mask
    var d = 0L
    var b = 30
    while (b >= 0) {
      val s = 1L << b
      val rx = (x >> b) & 1L
      val ry = (y >> b) & 1L
      d += s * s * ((3L * rx) ^ ry)
      // frame rotation for the next level: reflect within the FULL grid
      // (n-1 - coord), then swap — the xy2d formulation that keeps x, y
      // in [0, n) at every step
      if (ry == 0L) {
        val nx = if (rx == 1L) Mask - y else y
        val ny = if (rx == 1L) Mask - x else x
        x = nx
        y = ny
      }
      b -= 1
    }
    d
  }
}
