package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-portable shingle hashes of a token array as ONE codegen'd
  * expression: window i joins tokens[i..i+k-1] with a single space, takes
  * md5, and returns the first 4 digest bytes as an unsigned 32-bit value —
  * value-identical to
  * `conv(substring(md5(concat_ws(' ', window)), 1, 8), 16, 10)` and to
  * DuckDB's `('0x' || substr(md5(s), 1, 8))::BIGINT`, which is what makes
  * the PortableDedup pipeline hash-matchable cross-engine.
  *
  * Deduplication is by shingle STRING in first-occurrence order (the
  * `array_distinct`-over-strings semantics of Dedup.shingles): two distinct
  * shingles that collide in the 32-bit prefix still emit two array entries,
  * exactly as the composed-builtins formulation does.
  *
  * Why an Expression: the composed form builds window strings through a
  * `transform(sequence(...))` lambda, which evaluates INTERPRETED per
  * window — the same trap HashedShingles removes from the xxhash64 path.
  * Fewer than k tokens ⇒ empty array.
  */
case class Md5ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    Md5ShingleHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Md5ShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Md5ShingleHashes =
    copy(child = newChild)
}

object Md5ShingleHashes {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Space = UTF8String.fromString(" ")

  /** Static so generated and interpreted paths share one implementation. */
  def compute(tokens: ArrayData, k: Int): GenericArrayData = {
    val n = tokens.numElements()
    val nWindows = n - k + 1
    if (nWindows <= 0) return new GenericArrayData(Array.empty[Long])
    val md = digest.get()
    // string-keyed dedup preserving first-occurrence order, as
    // array_distinct over the shingle strings would produce
    val seen = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    val window = new Array[UTF8String](k)
    var i = 0
    while (i < nWindows) {
      var j = 0
      while (j < k) {
        // concat_ws semantics: null elements are skipped by the joiner
        window(j) = if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(Space, window: _*)
      if (!seen.containsKey(s)) {
        md.reset()
        val d = md.digest(s.getBytes)
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        seen.put(s, h)
      }
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.values().iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    new GenericArrayData(out)
  }
}
