package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Distinct 64-bit-hashed word k-shingles of a token array, as ONE codegen'd
  * expression: window i hashes tokens[i..i+k-1] with a chained xxhash64
  * (seed 42, then each token's bytes fold into the running seed — the same
  * chaining the built-in `xxhash64(c1, …, ck)` applies to k columns).
  *
  * Why an Expression and not `transform(sequence(...), i -> xxhash64(...))`:
  * higher-order-function lambdas evaluate INTERPRETED per element — at one
  * window per token of a 100 TB corpus the lambda interpreter is the whole
  * budget of MinHash signature generation (Dedup.hashedShingles is the inner
  * loop of every near-dup path). This loop runs inside whole-stage codegen
  * with one hash-set per row and zero per-window Catalyst evaluation.
  *
  * Fewer than k tokens ⇒ empty array (no complete window exists).
  * Output order is first occurrence, duplicates dropped — equivalent to
  * `array_distinct` over the window hashes.
  */
case class HashedShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override protected def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HashedShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  /** Spark's default xxhash64 seed. */
  final val Seed = 42L

  /** Static so the generated code and the interpreted path share one
    * implementation (cf. WinnowFingerprints). */
  def compute(tokens: ArrayData, k: Int): GenericArrayData = {
    val n = tokens.numElements()
    val nWindows = n - k + 1
    if (nWindows <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nWindows) {
      var h = Seed
      var j = 0
      while (j < k) {
        // null tokens fold as a no-op — the same skip the built-in
        // xxhash64(c1, …, ck) applies to a null column
        val s = if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        if (s != null) h = XXH64.hashUTF8String(s, h)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    new GenericArrayData(out)
  }
}
