package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fast-text-style document quality classifier over hashed bag-of-words
  * features — the "train a cheap linear model to mimic the expensive
  * rule cascade, then score the whole corpus with it" distillation loop a
  * curation pipeline runs so the full rule set (or an LLM judge) only has
  * to label a sample.
  *
  * Two halves, two gates:
  *  - [[score]] is the INFERENCE path with a deterministic hash-derived
  *    weight table: integer milli-weights summed as BIGINT (exact in any
  *    engine) with ONE terminal division — the whole query is
  *    oracle-hash-exact (`text_quality_lr`).
  *  - [[train]] is full-batch logistic-regression gradient descent, the
  *    distributed-iterative path: per round, the d-dim gradient is ONE
  *    typed-aggregator pass (each map task ships a single (d doubles, n)
  *    partial — the corpus never re-shuffles after the feature build),
  *    and the weight vector rides into the next round's plan as a
  *    broadcast literal, like the k-means centroid matrix. Gated by
  *    `LrQualitySpec` (≡ a sequential reference fold, learns a planted
  *    signal) — double gradient sums are order-sensitive, so the query
  *    registration is rows-only by design, the same posture as the other
  *    iterative trainers (BPE merges, Lloyd).
  */
object QualityModel {

  val Dim = 64

  private def bucket(tok: org.apache.spark.sql.Column) =
    PortableDedup.md5Hash32(tok) % Dim

  /** Hashed-feature linear scoring, oracle-exact: milli-weight(j) =
    * md5_32("w_" + j) % 1000 − 500, logit = Σ_tokens w(bucket(tok)) /
    * 1000. A PURE PROJECTION: the one-pass codegen'd
    * [[org.apache.spark.sql.graft.LrLogit]] folds the per-token weight
    * lookups inside whole-stage codegen — no explode, no aggregation, no
    * shuffle at all (same explode-elimination as token_stats). */
  def score(docs: DataFrame): DataFrame =
    graft.etl.Tables.fanOut(docs)
      .select(col("doc_id"),
        org.apache.spark.sql.GraftColumnBridge.column(
          org.apache.spark.sql.graft.LrLogit(
            org.apache.spark.sql.GraftColumnBridge.expression(
              TextAnalysis.tokens(col("text"))), Dim)).as("s"))
      .select(col("doc_id"), col("s.n_tokens").as("n_tokens"),
        (col("s.logit_milli").cast("double") / 1000.0).as("logit"),
        when(col("s.logit_milli") > 0, 1L).otherwise(0L).as("pred"))

  /** The explode + per-token lookup + groupBy formulation [[score]]
    * replaced — retained as the equivalence-spec reference model only. */
  private[graft] def scoreViaAgg(docs: DataFrame): DataFrame = {
    val wMilli = PortableDedup.md5Hash32(
      concat(lit("w_"), bucket(col("tok")).cast("string"))) % 1000 - 500
    graft.etl.Tables.fanOut(docs)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), wMilli.as("wm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wm")).as("lm"))
      .select(col("doc_id"), col("n_tokens"),
        (col("lm").cast("double") / 1000.0).as("logit"),
        when(col("lm") > 0, 1L).otherwise(0L).as("pred"))
  }

  /** Dense hashed token-count vectors: two shuffles total ((doc_id, j)
    * counts, then per-doc assembly through a bounded d-entry map), paid
    * ONCE before the training loop. */
  private[graft] def features(docs: DataFrame, d: Int = Dim): DataFrame =
    graft.etl.Tables.fanOut(docs, col("doc_id"))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), (PortableDedup.md5Hash32(col("tok")) % d).as("j"))
      .groupBy(col("doc_id"), col("j")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("j"), col("c")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(d - 1L), lit(1L)),
          jj => coalesce(element_at(col("m"), jj), lit(0L)).cast("double"))
          .as("x"))

  /** Distill the Gopher rule cascade into a d-weight logistic model:
    * label = keep_flag, `rounds` full-batch GD steps. Returns one row per
    * feature index: (feature_idx, weight). */
  def train(docs: DataFrame, d: Int = Dim, rounds: Int = 12,
            lr: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val labels = Curation.gopherRules(docs)
      .select(col("doc_id"), col("keep_flag").cast("double").as("y"))
    val xy = features(docs, d).join(labels, Seq("doc_id"))
      .select(col("x"), col("y")).cache()
    var w = Array.fill(d)(0.0)
    try {
      for (_ <- 0 until rounds) {
        val wLit = array(w.map(lit).toIndexedSeq: _*)
        // err = σ(w·x) − y; per-row arithmetic unchanged (codegen'd
        // DoubleVecDot + the same exp/divide expression tree). r21: the
        // d-dim partials now fold per PARTITION and the driver merges the
        // (numPartitions × d doubles) result — driver-sized by
        // construction, the kmeansMatrix posture — replacing the typed
        // udaf whose final aggregation added an exchange + a second AQE
        // stage job per round (2 jobs/round -> 1; partial-merge ORDER
        // changes, covered by LrQualitySpec's 1e-9 relative gate, same
        // posture as the exchange's arbitrary arrival order before).
        val err = lit(1.0) /
          (lit(1.0) + exp(-Similarity.ddot(col("x"), wLit))) - col("y")
        val dd = d
        val partials = xy
          .select(transform(col("x"), xi => xi * err).as("gx"))
          .as[Seq[Double]]
          .mapPartitions { it =>
            val g = new Array[Double](dd)
            var n = 0L
            it.foreach { v =>
              require(v.length == dd,
                s"grad_sum: vector length ${v.length} != $dd")
              var j = 0
              while (j < dd) { g(j) += v(j); j += 1 }
              n += 1
            }
            if (n == 0L) Iterator.empty
            else Iterator.single((g.toIndexedSeq: Seq[Double], n))
          }.collect()
        val gSums =
          if (partials.isEmpty) Seq.empty[Double]
          else partials.map(_._1).reduce { (a, b) =>
            a.zip(b).map { case (x, y) => x + y }
          }
        val n = partials.map(_._2).sum.toDouble
        w = w.zip(gSums).map { case (wi, gi) => wi - lr * gi / n }
      }
    } finally xy.unpersist()
    w.zipWithIndex.map { case (wi, j) => (j.toLong, wi) }.toIndexedSeq
      .toDF("feature_idx", "weight")
  }

  /** (milli-logit, Gopher keep flag) per document in ONE projection — the
    * label is computed inline from the same TokenStats pass instead of
    * joining back to gopherRules, so the evaluation queries touch the
    * corpus exactly once with zero joins. */
  private def milliScored(docs: DataFrame): DataFrame = {
    val ts = col("ts")
    val meanLen = ts.getField("sum_len").cast("double") /
      ts.getField("n_tokens")
    val topRatio = ts.getField("top_c").cast("double") /
      ts.getField("n_tokens")
    graft.etl.Tables.fanOut(docs)
      .select(
        org.apache.spark.sql.GraftColumnBridge.column(
          org.apache.spark.sql.graft.LrLogit(
            org.apache.spark.sql.GraftColumnBridge.expression(
              TextAnalysis.tokens(col("text"))), Dim)).as("s"),
        TextAnalysis.tokenStatsCol(TextAnalysis.tokens(col("text"))).as("ts"))
      .select(col("s.logit_milli").as("lm"),
        Curation.keepFlag(ts.getField("n_tokens"), meanLen, topRatio)
          .as("keep_flag"))
  }

  /** ROC-AUC of the hashed-LR logit against the Gopher keep labels — the
    * Mann-Whitney rank statistic computed EXACTLY: scores collapse to the
    * milli-logit HISTOGRAM (one partial-aggregated shuffle; everything
    * after runs on distinct score values, not documents), the positives'
    * doubled mid-rank sum is 2·R⁺ = Σ_g p_g·(2·below_g + n_g + 1) in
    * BIGINT, and AUC = (2·R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) is ONE terminal
    * division — bit-exact cross-engine, ties handled by the standard
    * mid-rank convention. The cumulative Window is single-partition BY
    * DESIGN: its input is the bounded score histogram (≤ the milli-logit
    * range), the same declared-bounded posture as the IVF centroid
    * collect. */
  def aucVsRules(docs: DataFrame): DataFrame =
    aucFromScored(milliScored(docs))

  private[graft] def aucFromScored(scored: DataFrame): DataFrame = {
    // The unpartitioned Window runs over the milli-logit HISTOGRAM, whose
    // cardinality is bounded by the SCORE RANGE, not the corpus: per-token
    // milli-weights lie in [-500, 499], and the documents admission gate
    // (Checks.documentsRules: n_chars <= 10000 ⇒ <= 5000 whitespace
    // tokens) bounds |logit_milli| <= 500 * 5000 = 2.5e6 — at most ~5e6
    // distinct values at ANY corpus row count, i.e. a few MB through one
    // task. QualityEvalSpec asserts the fixture histogram stays under the
    // bound. A corpus without a token-count ceiling must cap or re-bin
    // before this Window.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("lm"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    scored
      .groupBy(col("lm"))
      .agg(count(lit(1)).as("n"), sum(col("keep_flag")).as("p"))
      .withColumn("below", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(sum(col("p")).as("n_pos"),
        sum(col("n") - col("p")).as("n_neg"),
        sum(col("p") * (col("below") * 2L + col("n") + 1L)).as("r2"))
      .select(col("n_pos"), col("n_neg"),
        ((col("r2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
          (col("n_pos") * col("n_neg") * 2L).cast("double")).as("auc"))
  }

  /** Calibration / reliability table: documents bucketed by half-unit
    * logit bins (floor(lm/500) — floor on BOTH engines, safe at the bin
    * boundary because IEEE division of a multiple of 500 is exact), per
    * bin the exact count, keep count, exact mean logit and keep rate (one
    * terminal division each). The whole query is one map-side projection
    * plus one bounded-key aggregation. */
  def calibration(docs: DataFrame, binMilli: Int = 500): DataFrame =
    calibrationFromScored(milliScored(docs), binMilli)

  private[graft] def calibrationFromScored(scored: DataFrame,
                                           binMilli: Int): DataFrame =
    scored
      .select(floor(col("lm").cast("double") / binMilli).cast("long")
        .as("bin"), col("lm"), col("keep_flag"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("keep_flag")).as("n_keep"),
        sum(col("lm")).as("slm"))
      .select(col("bin"), col("n"), col("n_keep"),
        (col("slm").cast("double") / (col("n") * 1000L).cast("double"))
          .as("mean_logit"),
        (col("n_keep").cast("double") / col("n").cast("double"))
          .as("keep_rate"))
}

/** [[graft.functions.VecSumAggregator]]'s double twin for gradient
  * partials (gradients are already Array[Double]; a float round-trip
  * would shift the spec's sequential-reference comparison). */
final case class GradSum(sums: Seq[Double], n: Long)

class GradSumAggregator extends Aggregator[(Seq[Double], Long), GradSum, GradSum] {

  override def zero: GradSum = GradSum(Seq.empty, 0L)

  private def add(acc: Seq[Double], v: Seq[Double]): Seq[Double] =
    if (acc.isEmpty) v
    else {
      require(acc.length == v.length,
        s"grad_sum: vector lengths differ (${acc.length} vs ${v.length})")
      val out = acc.toArray
      var i = 0
      while (i < out.length) { out(i) += v(i); i += 1 }
      out.toIndexedSeq
    }

  override def reduce(b: GradSum, a: (Seq[Double], Long)): GradSum =
    GradSum(add(b.sums, a._1), b.n + a._2)

  override def merge(x: GradSum, y: GradSum): GradSum =
    GradSum(add(x.sums, y.sums), x.n + y.n)

  override def finish(r: GradSum): GradSum = r

  override def bufferEncoder: Encoder[GradSum] = Encoders.product[GradSum]
  override def outputEncoder: Encoder[GradSum] = Encoders.product[GradSum]
}
