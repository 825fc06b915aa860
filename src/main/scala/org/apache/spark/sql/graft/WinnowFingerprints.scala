package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken) as one
  * codegen'd expression: Rabin-Karp ROLLING hash over char k-grams
  * (h ← (h·B + c) mod P, slide by subtracting c_out·B^(k-1)), then the
  * minimum of each w-window of gram hashes, de-duplicated. Guarantees any
  * shared substring of length ≥ k+w-1 produces a shared fingerprint.
  *
  * Why an Expression and not Column composition: higher-order-function
  * lambdas (transform/aggregate) evaluate INTERPRETED per element — at one
  * gram per character of a 100 TB corpus that is the whole budget. This
  * loop runs inside whole-stage codegen with zero allocation per gram.
  *
  * Arithmetic is mod P = 1e9+7 with B = 31 so every intermediate fits a
  * 64-bit signed integer WITHOUT overflow — the exact same values are
  * computable in ANSI SQL (the DuckDB oracle reproduces them; BIGINT
  * overflow would error there, wrap-around Long arithmetic would not
  * match). Chars are UTF-16 units (≡ code points ≡ bytes for ASCII).
  */
case class WinnowFingerprints(child: Expression, k: Int = 8, w: Int = 4)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(WinnowFingerprints.fingerprints(s, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"org.apache.spark.sql.graft.WinnowFingerprints.fingerprints(" +
        s"$c.toString(), $k, $w))")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  final val B = 31L
  final val P = 1000000007L

  /** Distinct window-min gram hashes, first-seen order. Static so the
    * generated code and the interpreted path share one implementation. */
  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.length
    val nGrams = math.max(n - k + 1, 0)
    if (nGrams == 0) {
      // degenerate short input: hash the whole string as one gram
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + s.charAt(i)) % P; i += 1 }
      return Array(h)
    }
    val grams = new Array[Long](nGrams)
    // pow = B^(k-1) mod P for the rolling subtract
    var pow = 1L
    var j = 1
    while (j < k) { pow = (pow * B) % P; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + s.charAt(i)) % P; i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - (s.charAt(i - k) * pow) % P + P) % P // stay non-negative
      h = (h * B + s.charAt(i)) % P
      grams(i - k + 1) = h
      i += 1
    }
    val nWin = math.max(nGrams - w + 1, 1)
    val seen = new java.util.LinkedHashSet[Long]()
    var x = 0
    while (x < nWin) {
      var m = grams(x)
      var y = x + 1
      val end = math.min(x + w, nGrams)
      while (y < end) { if (grams(y) < m) m = grams(y); y += 1 }
      seen.add(m)
      x += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    out
  }
}
