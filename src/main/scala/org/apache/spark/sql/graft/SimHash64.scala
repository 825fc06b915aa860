package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as ONE codegen'd per-row expression:
  * bit b of the signature is the sign of Σ_tokens (±1 by bit b of
  * xxhash64(token, seed 42)) — the classic Charikar sketch.
  *
  * Why an Expression and not explode + 64 conditional-sum aggregates:
  * simhash is a PER-DOCUMENT function — nothing about it needs cross-row
  * aggregation, so the previous explode → groupBy(doc_id).agg(64 × sum(when))
  * formulation paid a full shuffle of every token of the corpus plus 64
  * aggregate-buffer updates per token, purely to re-group rows that started
  * out together. At 100 TB the explode alone multiplies the shuffle volume
  * by average-tokens-per-doc. This loop runs inside whole-stage codegen with
  * 64 int counters on the stack and zero data movement.
  *
  * Tie-breaking matches the aggregate formulation exactly: a bit is set iff
  * its counter is strictly positive (sum > 0). Empty array ⇒ 0L. A null
  * token element folds as xxhash64's null semantics (hash = seed).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Spark's default xxhash64 seed. */
  final val Seed = 42L

  /** Static so the generated code and the interpreted path share one
    * implementation (cf. HashedShingles.compute). */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      // xxhash64(null) = seed — mirror the built-in's null fold
      val h =
        if (tokens.isNullAt(i)) Seed
        else XXH64.hashUTF8String(tokens.getUTF8String(i), Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
