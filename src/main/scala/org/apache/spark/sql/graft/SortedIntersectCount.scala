package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two SORTED, de-duplicated BIGINT arrays via a two-pointer
  * merge — the hot inner loop of near-dup verification (Dedup.verifyJaccard).
  *
  * Rationale: the built-in `array_intersect` builds a hash set per call and
  * materializes the intersection array; for millions of candidate pairs the
  * cardinality is all that's needed. This expression is O(|A|+|B|) with zero
  * allocation, participates in whole-stage codegen (doGenCode emits the raw
  * loop), and reads primitive longs straight out of the ArrayData.
  *
  * Inputs MUST be sorted ascending and distinct (array_sort ∘ array_distinct
  * upstream); duplicates or unsorted input give an undercount, not an error.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $n1 = $a.numElements();
         |final int $n2 = $b.numElements();
         |while ($i < $n1 && $j < $n2) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
