package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft._
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point — registers every graft native
  * function into the session FunctionRegistry so plain SQL reaches the
  * whole surface, and injects the band-join optimizer rule:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *   SELECT sorted_intersect_count(a, b), simhash64(toks) ...
  *
  * (DataFrame code paths don't need the registry — they wrap the Expression
  * directly via GraftColumnBridge.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Static int parameters (shingle k, plane count) must be literals — they
    * are baked into the generated code, not evaluated per row. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT parameter, got $other")
  }

  private def reg(ext: SparkSessionExtensions, name: String, cls: Class[_])(
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction(
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-plan rewrite: abs(a-b) <= W theta joins become banded equi-joins
    ext.injectOptimizerRule(_ => BandedRangeJoinRule)
    // time-bucket rollup pushdown for the influx source — preCBO so it
    // sees the scan AFTER V2 pushdown claimed the filters into it
    ext.injectPreCBORule(_ => InfluxBucketRollupRule)
    // raw-scan narrowing for tag equality filters (residual-kept)
    ext.injectPreCBORule(_ => InfluxTagFilterRule)
    // grouped-TopN narrowing: row_number ≤ k per tag group → per-group
    // Flux top/bottom(n:) (residual-kept, like the tag narrowing)
    ext.injectPreCBORule(_ => InfluxGroupTopNRule)
    // physical as-of join (logical node planned to a co-partitioned merge)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectPlannerStrategy(_ => InfluxRollupStrategy)
    reg(ext, "sorted_intersect_count", classOf[SortedIntersectCount])(c =>
      SortedIntersectCount(c.head, c(1)))
    reg(ext, "fvec_dot", classOf[FloatVecDot])(c => FloatVecDot(c.head, c(1)))
    reg(ext, "dvec_dot", classOf[DoubleVecDot])(c => DoubleVecDot(c.head, c(1)))
    reg(ext, "winnow_fingerprints", classOf[WinnowFingerprints])(c =>
      WinnowFingerprints(c.head))
    reg(ext, "hashed_shingles", classOf[HashedShingles])(c =>
      HashedShingles(c.head, intLit(c(1), "hashed_shingles")))
    reg(ext, "md5_shingle_hashes", classOf[Md5ShingleHashes])(c =>
      Md5ShingleHashes(c.head, intLit(c(1), "md5_shingle_hashes")))
    reg(ext, "simhash64", classOf[SimHash64])(c => SimHash64(c.head))
    reg(ext, "sorted_pairs", classOf[SortedPairs])(c => SortedPairs(c.head))
    reg(ext, "sign_sketch", classOf[SignSketch])(c =>
      SignSketch(c.head, intLit(c(1), "sign_sketch")))
    reg(ext, "quantize_int8", classOf[QuantizeInt8])(c => QuantizeInt8(c.head))
    // one-pass per-doc token stats over the engine's standard stopword list
    reg(ext, "token_stats", classOf[TokenStats])(c =>
      TokenStats(c.head, graft.ext.TextAnalysis.stopwords))
    reg(ext, "zorder_key", classOf[ZOrderKey])(c => ZOrderKey(c.head))
    reg(ext, "hilbert_key", classOf[HilbertKey])(c => HilbertKey(c.head))
    // one-pass hashed-feature linear scoring (dim-bucket weight table)
    reg(ext, "lr_logit", classOf[LrLogit])(c =>
      LrLogit(c.head, intLit(c(1), "lr_logit")))
  }
}
