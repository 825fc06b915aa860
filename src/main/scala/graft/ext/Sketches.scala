package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketching (SURVEY X2/X7 extension): HyperLogLog over the
  * portable md5 hash family — the pre-dedup planning query ("how many
  * distinct documents does this 100 TB crawl actually contain?") that a
  * pipeline runs BEFORE paying for exact dedup, to size the job and
  * predict the dedup rate.
  *
  * Unlike `approx_count_distinct` (Spark's built-in HLL++, whose register
  * layout is engine-private), every stage here is cross-engine
  * deterministic, so BOTH the register table and the final estimate are
  * bit-exact against the DuckDB oracle: the hash is the md5 32-bit prefix
  * ([[PortableDedup.md5Hash32]]), ρ comes from `bin()`/`length` (identical
  * semantics in both engines, no libm), and the harmonic sum Σ 2^-r is
  * EXACT in IEEE double regardless of accumulation order — every term is a
  * multiple of 2^-27 and the total stays below 2^7, so all partial sums
  * need ≤ 34 mantissa bits. The raw-estimate formula (α·m² / Z) is a fixed
  * multiply-then-divide sequence both engines execute identically. The
  * small-range linear-counting correction is deliberately NOT applied (it
  * needs `ln`, whose rounding is libm-private); `n_zero_regs` is emitted so
  * a consumer can apply it, and the spec checks the raw estimate's error
  * against the m=64 stderr bound instead.
  *
  * Scale: the classic sketch shape — the exchange carries at most m
  * (bucket, ρ) pairs per map task after partial max-aggregation, never
  * rows; the register table is m rows total no matter the corpus size.
  */
object Sketches {

  /** HLL registers over distinct `text`: bucket = top p bits of the 32-bit
    * portable hash, ρ = leading-zero count of the remaining (32−p)-bit
    * suffix + 1 (computed as (32−p+1) − bitlength via `bin`), register =
    * max ρ per bucket. Only non-empty buckets emit a row (the estimate
    * treats missing buckets as ρ = 0). */
  def hllRegisters(docs: DataFrame, p: Int = 6): DataFrame = {
    val (bucket, rho) = hllBucketRho(PortableDedup.md5Hash32(col("text")), p)
    docs.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("r"))
  }

  /** (bucket, ρ) of a 32-bit portable hash value — shared by the batch
    * register build and the streaming per-window twin
    * ([[graft.streaming.StreamingEvents.hllDistinctUsersStream]]), so the
    * two can never drift. */
  def hllBucketRho(v: Column, p: Int = 6): (Column, Column) = {
    require(p > 0 && p < 32, s"p out of range: $p")
    val suffixBits = 32 - p
    val bucket = shiftright(v, suffixBits)
    val w = v.bitwiseAND(lit((1L << suffixBits) - 1))
    val rho = when(w === 0, lit(suffixBits + 1))
      .otherwise(lit(suffixBits + 1) - length(bin(w)))
    (bucket, rho.cast("long"))
  }

  /** Raw HLL estimate vs the exact distinct count, one row: α_m·m²/Z with
    * Z = Σ_buckets 2^-r (empty buckets contribute 2^0 = 1). α_m, the
    * m²-multiply, and the terminal division are the identical IEEE op
    * sequence in the oracle SQL, so `est_distinct` and `rel_err` are
    * bit-exact cross-engine — the estimator's ERROR is oracle-verified,
    * same posture as `dedup_jaccard_est`. The exact side is one
    * count(distinct text) — the expensive query the sketch replaces at
    * scale, kept here as the yardstick. */
  def hllEstimate(docs: DataFrame, p: Int = 6): DataFrame = {
    val m = 1 << p
    val regs = hllRegisters(docs, p)
    val z = regs.agg(
      sum(lit(1.0) / expr("shiftleft(cast(1 as bigint), cast(r as int))"))
        .as("z_present"),
      count(lit(1)).as("n_present"))
    val exact = docs.agg(countDistinct(col("text")).as("n_exact"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val zTotal = col("z_present") + (lit(m) - col("n_present")).cast("double")
    val est = alpha * lit((m.toLong * m).toDouble) / zTotal
    z.crossJoin(exact)
      .select(est.as("est_distinct"),
        col("n_exact"),
        (lit(m) - col("n_present")).cast("long").as("n_zero_regs"),
        ((est - col("n_exact").cast("double")) / col("n_exact").cast("double"))
          .as("rel_err"))
  }

  /** Sketch MERGEABILITY, stated as a query: registers built independently
    * on two disjoint shards of the corpus, max-merged — the oracle is the
    * register table of the WHOLE corpus, so the driver verifies
    * merge(shard sketches) ≡ sketch(union) bit-exactly. This is the
    * 1000-executor property: every shard summarizes locally to m
    * registers; merging costs m rows per shard regardless of data size. */
  def hllMerge(docs: DataFrame, p: Int = 6): DataFrame =
    hllRegisters(docs.filter(col("doc_id") % 2 === 0), p)
      .union(hllRegisters(docs.filter(col("doc_id") % 2 =!= 0), p))
      .groupBy(col("bucket"))
      .agg(max(col("r")).as("r"))

  /** Sketch SET ALGEBRA: cohort-overlap estimation by inclusion-exclusion
    * over HLL sketches — |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    * union sketch is the max-merge of the two cohort sketches (the only
    * set operation HLL supports natively; intersection falls out
    * algebraically). The audience-overlap / cross-corpus-contamination
    * planning query: at 100 TB each cohort summarizes to m registers and
    * the whole answer is driver-scalar arithmetic — the exact yardstick
    * (a distinct-text join between the cohorts) is the query the sketch
    * replaces, kept as the verification column.
    *
    * Every estimate is the same fixed IEEE op sequence as [[hllEstimate]]
    * (harmonic sums exact in double, α·m²/Z multiply-then-divide), and
    * the inclusion-exclusion is one left-assoc add/subtract chain — so
    * est_a/est_b/est_union/est_intersect are all bit-exact cross-engine,
    * same posture as `docs_hll_estimate`. Cohorts: doc_id % 3 ≠ 0 vs
    * doc_id % 2 ≠ 0 — ids coprime-striped so the overlap is large but
    * proper. */
  def hllIntersect(docs: DataFrame, p: Int = 6): DataFrame = {
    val m = 1 << p
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    def estOf(regs: DataFrame, name: String): DataFrame =
      regs.agg(
          sum(lit(1.0) / expr("shiftleft(cast(1 as bigint), cast(r as int))"))
            .as("zp"),
          count(lit(1)).as("np"))
        .select((alpha * lit((m.toLong * m).toDouble) /
          (col("zp") + (lit(m) - col("np")).cast("double"))).as(name))
    val ra = hllRegisters(a, p)
    val rb = hllRegisters(b, p)
    val ru = ra.union(rb).groupBy(col("bucket")).agg(max(col("r")).as("r"))
    val exact = a.select(col("text")).distinct()
      .join(b.select(col("text")).distinct(), "text")
      .agg(count(lit(1)).as("n_exact_inter"))
    estOf(ra, "est_a").crossJoin(estOf(rb, "est_b"))
      .crossJoin(estOf(ru, "est_union")).crossJoin(exact)
      .select(col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"),
        col("n_exact_inter"))
  }

  /** CMS mergeability: cell-wise SUM of two shard tables ≡ the whole-corpus
    * table (counters are linear) — same oracle as [[cmsCounts]]. */
  def cmsMerge(docs: DataFrame, depth: Int = 4, width: Int = 256): DataFrame =
    cmsCounts(docs.filter(col("doc_id") % 2 === 0), depth, width)
      .union(cmsCounts(docs.filter(col("doc_id") % 2 =!= 0), depth, width))
      .groupBy(col("cms_row"), col("cms_col"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Count-Min cell for hash row j: ((a_j·x + b_j) mod P) mod width, over
    * the portable affine family — one expression for build AND probe. */
  private def cmsCell(x: Column, j: Int, width: Int): Column =
    ((lit(PortableDedup.hashA(j)) * x + lit(PortableDedup.hashB(j)))
      % PortableDedup.P) % width

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) of the token stream:
    * a depth × width counter table where every token occurrence increments
    * one cell per hash row; any token's frequency estimate is the min over
    * its depth cells — an OVERcount, never an undercount. The
    * Misra–Gries twin ([[TextAnalysis.heavyHittersPerLang]]) answers
    * "which tokens are frequent"; CMS answers point frequency queries for
    * ANY token, which is what a quality-filter pipeline asks when scoring
    * documents against a frequency table that doesn't fit per-task memory
    * as an exact map.
    *
    * Scale: the token stream reduces to (row, cell) pairs at the scan and
    * partial aggregation caps the exchange at depth × width counters per
    * map task — the sketch property. Counters sum exactly (BIGINT), and
    * the hash family is the portable md5+affine one, so the WHOLE table
    * is oracle-hash-exact — same bridge as the HLL registers. */
  def cmsCounts(docs: DataFrame, depth: Int = 4, width: Int = 256): DataFrame = {
    val x = PortableDedup.md5Hash32(col("token"))
    graft.etl.Tables.fanOut(docs)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .select(posexplode(array((0 until depth).map(j =>
        cmsCell(x, j, width)): _*)).as(Seq("cms_row", "cms_col")))
      .groupBy(col("cms_row").cast("long").as("cms_row"), col("cms_col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CMS point estimates vs truth for the exact top-`topN` tokens: est =
    * min over the token's depth cells, which the CMS guarantee bounds
    * below by the true count — `overcount` = est − exact ≥ 0 always.
    * Estimate, truth, AND the error are all integer-exact cross-engine
    * (the `dedup_jaccard_est` posture: the estimator's error is itself
    * oracle-verified). The top-N candidate pick is deterministic
    * ((count DESC, token ASC) → TakeOrderedAndProject) and the probe side
    * is topN × depth rows — broadcast against the depth × width table. */
  def cmsEstimates(docs: DataFrame, depth: Int = 4, width: Int = 256,
                   topN: Int = 10): DataFrame = {
    val cms = cmsCounts(docs, depth, width)
    val toks = graft.etl.Tables.fanOut(docs)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val top = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token").asc)
      .limit(topN)
    val x = PortableDedup.md5Hash32(col("token"))
    val probes = top.select(col("token"), col("exact_cnt"),
      posexplode(array((0 until depth).map(j =>
        cmsCell(x, j, width)): _*)).as(Seq("cms_row", "cms_col")))
      .select(col("token"), col("exact_cnt"),
        col("cms_row").cast("long").as("cms_row"), col("cms_col"))
    cms.join(broadcast(probes), Seq("cms_row", "cms_col"))
      .groupBy(col("token"), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("token"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"))
  }
}
