package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, LongType}

/** All-bits-set probe of a driver-built Bloom bitset: input is the array of
  * k bit positions (computed by the UNCHANGED Catalyst xxhash64/pmod
  * expressions, so build/probe agreement is untouched), output is whether
  * every probed bit is set in `words`.
  *
  * Why an Expression and not `element_at(lit(words), …)` column arithmetic
  * (r21): a Literal carrying the m-bit filter is re-rendered by EVERY plan
  * stringification — explain, AQE plan logging, the SQL listener — at
  * O(m) per render (a 10× fixture run spent MINUTES of driver time inside
  * GenericArrayData.toString under the dq_referential_bloom plans), and the
  * k probe expressions each embedded their own copy of the literal, so the
  * task binary carried k × m/8 bytes (15.7 MiB broadcasts at 10× sf0.1).
  * Here the bitset ships ONCE as a codegen reference object and toString
  * renders as a constant-size tag. Bit arithmetic identical to the column
  * form: bit p set ⇔ (words[p >>> 6] >> (p & 63)) & 1 == 1 for
  * p ∈ [0, m) from pmod. */
case class BloomProbe(child: Expression, words: Seq[Long], mBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  // the whole point: never render the bitset into plan strings
  override def toString: String =
    s"bloom_probe($child, m=$mBits, words=<${words.length} longs>)"

  @transient private lazy val model = BloomProbe.Model(words.toArray)

  override protected def nullSafeEval(input: Any): Any =
    model.allSet(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bloomModel", model,
      classOf[BloomProbe.Model].getName)
    defineCodeGen(ctx, ev, c => s"$modelRef.allSet($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  /** Array holder whose toString stays constant-size (a case class with a
    * Seq field would re-render every element). */
  class Model(val words: Array[Long]) extends Serializable {
    def allSet(positions: ArrayData): Boolean = {
      val n = positions.numElements()
      var i = 0
      while (i < n) {
        val p = positions.getLong(i)
        if (((words((p >>> 6).toInt) >> (p & 63L).toInt) & 1L) != 1L)
          return false
        i += 1
      }
      true
    }
    override def toString: String = s"BloomBits(<${words.length} longs>)"
  }
  object Model {
    def apply(words: Array[Long]): Model = new Model(words)
  }
}
