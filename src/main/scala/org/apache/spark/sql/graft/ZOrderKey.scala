package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Morton (Z-order) key over an INT coordinate array: bit b of dimension c
  * lands at output bit b·n + c, so sorting by the key clusters rows that
  * are close in EVERY dimension — the layout that lets parquet min/max
  * stats skip files on multi-column predicates (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`). Each dimension contributes
  * floor(62/n) low bits (62 keeps the result clear of the Long sign bit);
  * values are expected in [0, 2^(62/n)) — higher bits are ignored, which
  * is bit-identical to the arithmetic-shift-and-mask the oracle computes,
  * so negatives stay deterministic (just not order-preserving). A null
  * element nulls the key (a row with an unknown coordinate has no place
  * on the curve). */
case class ZOrderKey(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "zorder_key"

  override protected def nullSafeEval(input: Any): Any =
    ZOrderKey.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: two zorder_key calls in one stage would otherwise
      // declare the same Java local and fail janino compilation
      val zk = ctx.freshName("zk")
      s"""
      java.lang.Long $zk = org.apache.spark.sql.graft.ZOrderKey.compute($c);
      ${ev.isNull} = ($zk == null);
      ${ev.value} = ${ev.isNull} ? -1L : $zk.longValue();
    """
    })

  override protected def withNewChildInternal(newChild: Expression): ZOrderKey =
    copy(child = newChild)
}

object ZOrderKey {
  /** Null-boxed so a null coordinate can null the whole key. */
  def compute(v: ArrayData): java.lang.Long = {
    val n = v.numElements()
    require(n >= 1 && n <= 31, s"zorder_key: need 1..31 dimensions, got $n")
    val bits = 62 / n
    var key = 0L
    var c = 0
    while (c < n) {
      if (v.isNullAt(c)) return null
      // widen BEFORE shifting: int shifts mask the distance to 5 bits, so
      // (x >> b) for b >= 32 would re-read the low bits; the long shift is
      // also exactly DuckDB's CAST(x AS BIGINT) >> b, sign-extension and all
      val x = v.getInt(c).toLong
      var b = 0
      while (b < bits) {
        key |= ((x >> b) & 1).toLong << (b * n + c)
        b += 1
      }
      c += 1
    }
    key
  }
}
