package graft.ext

import org.apache.spark.sql.DataFrame
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
    require(p > 0 && p < 32, s"p out of range: $p")
    val suffixBits = 32 - p
    val v = PortableDedup.md5Hash32(col("text"))
    val bucket = shiftright(v, suffixBits).as("bucket")
    val w = v.bitwiseAND(lit((1L << suffixBits) - 1))
    val rho = when(w === 0, lit(suffixBits + 1))
      .otherwise(lit(suffixBits + 1) - length(bin(w)))
    docs.select(bucket, rho.cast("long").as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("r"))
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
}
