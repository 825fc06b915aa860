package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs (a, b) with a before b from a BIGINT id array — the
  * LSH bucket → candidate-pair expansion (Dedup.minhashLsh). Input arrays
  * are bucket membership lists (size-capped upstream), so the n·(n-1)/2
  * fan-out is bounded.
  *
  * Replaces `flatten(transform(ids, (a,i) -> transform(slice(...), ...)))`,
  * whose nested lambdas evaluate interpreted per pair and materialize a
  * sliced array per outer element. This emits the pair structs in one flat
  * preallocated pass inside whole-stage codegen.
  */
case class SortedPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "sorted_pairs"

  override protected def nullSafeEval(input: Any): Any =
    SortedPairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SortedPairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {
  def compute(ids: ArrayData): GenericArrayData = {
    val n = ids.numElements()
    // internal callers cap buckets at maxBucket=1000, but the function is
    // SQL-registered too: guard the n*(n-1)/2 fan-out against Int overflow
    val nPairs = n.toLong * (n - 1) / 2
    require(nPairs <= Int.MaxValue,
      s"sorted_pairs: $n elements -> $nPairs pairs exceeds array limits; " +
        "cap the bucket size upstream")
    val out = new Array[Any](nPairs.toInt)
    var idx = 0
    var i = 0
    while (i < n) {
      // SQL-registered: ARRAY<BIGINT> admits null elements, and a null id
      // would silently read as doc_id 0 — reject loudly instead
      require(!ids.isNullAt(i),
        s"sorted_pairs: null element at position $i; ids must be non-null")
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = InternalRow(a, ids.getLong(j))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
