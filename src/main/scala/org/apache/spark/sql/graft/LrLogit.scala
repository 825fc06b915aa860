package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass hashed-feature linear scoring: for each token, bucket =
  * md5_32(token) % dim, milli-logit += weight(bucket), where weight(j) =
  * md5_32("w_" + j) % 1000 − 500 — the same 32-bit md5-prefix value as
  * `('0x' || substr(md5(s), 1, 8))::BIGINT` in DuckDB, so the result is
  * oracle-hash-exact. Returns (n_tokens, logit_milli) as one struct.
  *
  * Replaces the explode → per-(doc, token) weight lookup → groupBy(doc_id)
  * formulation (`QualityModel.scoreViaAgg`, kept as the equivalence-spec
  * reference): that shape materializes one row PER TOKEN and pays an
  * aggregation exchange; this expression keeps scoring a pure map-side
  * projection inside whole-stage codegen — the same explode-elimination
  * as [[TokenStats]]. The dim-entry weight table is built once per
  * expression instance and shipped as a codegen reference object. */
case class LrLogit(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("logit_milli", LongType, nullable = false)))
  override def prettyName: String = "lr_logit"

  @transient private lazy val weights: Array[Long] = LrLogit.weightTable(dim)

  override protected def nullSafeEval(input: Any): Any =
    LrLogit.compute(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lrLogitWeights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.LrLogit.compute($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LrLogit =
    copy(child = newChild)
}

object LrLogit {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 digest bytes as an unsigned 32-bit value — identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)` and DuckDB's
    * `('0x' || substr(md5(s), 1, 8))::BIGINT`. */
  private def md5_32(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  def weightTable(dim: Int): Array[Long] = {
    require(dim > 0, s"lr_logit: dim must be positive: $dim")
    Array.tabulate(dim) { j =>
      md5_32(s"w_$j".getBytes(java.nio.charset.StandardCharsets.UTF_8)) %
        1000 - 500
    }
  }

  /** Static so generated and interpreted paths share one implementation. */
  def compute(tokens: ArrayData, weights: Array[Long]): InternalRow = {
    val n = tokens.numElements()
    var lm = 0L
    var i = 0
    while (i < n) {
      // a null token contributes no weight but counts toward n_tokens —
      // the oracle's count(*) / sum(md5(NULL) is NULL) tail
      if (!tokens.isNullAt(i)) {
        val h = md5_32(tokens.getUTF8String(i).getBytes)
        lm += weights((h % weights.length).toInt)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, lm))
  }
}
