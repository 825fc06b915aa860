package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token statistics in ONE codegen'd pass over the token
  * array: struct(n_tokens, n_distinct, sum_len, top_c, n_stopword) — token
  * count, distinct-token count, total characters, the top token's
  * occurrence count, and stopword hits (multiplicity included).
  *
  * Token statistics are PER-ROW facts: a document's token multiset fits in
  * one task by construction (a doc is one parquet cell), so the
  * explode → groupBy(doc, token) → groupBy(doc) two-shuffle formulation
  * pays two corpus-wide exchanges to regroup rows that started out
  * together — the same trap SimHash64 removed for signature bits. The
  * composed column formulation (size / array_distinct /
  * aggregate-HOF / filter-isin) is shuffle-free but evaluates its lambdas
  * interpreted per element. This expression subsumes both: one hash map
  * per row inside whole-stage codegen.
  *
  * Character counts use UTF8String.numChars ≡ Catalyst length() ≡ DuckDB
  * len() — codepoint semantics agree across all three. Null token
  * elements are rejected loudly (split() never produces them; silent
  * skipping would desynchronize n_tokens from the oracle's len()).
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("n_stopword", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.length * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenStatsStopwords", stopSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TokenStats.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  def compute(toks: ArrayData,
              stopwords: java.util.HashSet[UTF8String]): InternalRow = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Long](math.max(16, n * 2))
    var sumLen = 0L
    var nStop = 0L
    var i = 0
    while (i < n) {
      require(!toks.isNullAt(i),
        s"token_stats: null token at position $i; tokens must be non-null")
      val t = toks.getUTF8String(i)
      sumLen += t.numChars()
      if (stopwords.contains(t)) nStop += 1
      counts.put(t, counts.getOrDefault(t, 0L) + 1L)
      i += 1
    }
    var topC = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > topC) topC = c
    }
    new GenericInternalRow(Array[Any](
      n.toLong, counts.size().toLong, sumLen, topC, nStop))
  }
}
