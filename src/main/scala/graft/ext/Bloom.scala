package graft.ext

import graft.functions.BitsetAggregator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter membership — the 100 TB path for "is this new
  * document's fingerprint already in the base corpus?" when the base is too
  * large to shuffle against every ingest batch.
  *
  * [[Dedup.incrementalDedup]]'s anti-join is EXACT but co-shuffles batch
  * and base fingerprints on every run; at a 100 TB base that is a standing
  * exchange of billions of 16-byte keys per ingest. The Bloom form reads
  * the base ONCE into an m-bit set (one partial bitset per map task, OR-
  * merged through a single-row aggregation — the exchange carries m/64-word
  * partials, never fingerprints), then probes it as a BROADCAST literal
  * with pure codegen'd column arithmetic — the batch side never shuffles at
  * all, and the filter is reusable across ingest runs.
  *
  * Semantics: no false negatives ever (a fingerprint in the base ALWAYS
  * tests maybe_in_base = true); false positives at the classic
  * (1 - e^(-kn/m))^k rate drop genuinely-new docs — the standard trade,
  * bounded by sizing m to the base cardinality (asserted in BloomSpec).
  * The k hash family is xxhash64 seeded by hash index, evaluated with the
  * SAME Catalyst expression on both build and probe sides, so cross-side
  * disagreement is impossible by construction.
  */
object Bloom {

  /** k bit positions of `fp` in an m-bit filter: pmod(xxhash64(j, fp), m)
    * for j = 0..k-1. One expression family for build AND probe. */
  private def positions(fp: Column, mBits: Int, kHashes: Int): Seq[Column] =
    (0 until kHashes).map(j => pmod(xxhash64(lit(j), fp), lit(mBits.toLong)))

  /** Scan the base once → the m-bit set as driver-side words (m is the
    * caller's FP budget — driver-sized by construction, broadcastable). */
  def buildBits(base: DataFrame, fp: Column, mBits: Int = 1 << 16,
                kHashes: Int = 5): Array[Long] =
    buildBitsFrame(base, fp, mBits, kHashes).head().getSeq[Long](0).toArray

  /** [[buildBits]] as an UNCOLLECTED one-row, one-column (array<long>)
    * frame, so a caller with several independent filters to build can
    * crossJoin them into ONE action and let their scan+aggregate stages
    * materialize concurrently (Checks.referentialBloomAllDetailed). */
  def buildBitsFrame(base: DataFrame, fp: Column, mBits: Int,
                     kHashes: Int): DataFrame = {
    val agg = udaf(new BitsetAggregator(mBits))
    val posCol = array(positions(fp, mBits, kHashes): _*)
    base.select(explode(posCol).as("p")).agg(agg(col("p")))
  }

  /** Membership test as a pure Column expression over the plan-shipped
    * words: all k probed bits set. No join, no shuffle, no UDF — the k
    * positions stay the SAME Catalyst xxhash64/pmod expressions as the
    * build side, and the probe is the codegen'd
    * [[org.apache.spark.sql.graft.BloomProbe]]. The previous
    * `element_at(lit(bits), …)` arithmetic embedded the m-bit filter as a
    * LITERAL once per hash probe: k copies in every task binary (15.7 MiB
    * broadcasts on a 10× fixture) and an O(m) re-render on every plan
    * stringification — a 10× dq_referential_bloom run spent minutes of
    * driver time inside GenericArrayData.toString (r21; bit arithmetic
    * unchanged, oracle hash-exact). */
  def memberExpr(fp: Column, bits: Array[Long], mBits: Int,
                 kHashes: Int = 5): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.graft.BloomProbe(
        org.apache.spark.sql.GraftColumnBridge.expression(
          array(positions(fp, mBits, kHashes): _*)),
        bits.toIndexedSeq, mBits))

  /** Bloom twin of [[Dedup.incrementalDedup]]'s base-membership verdict:
    * one row per batch doc with `maybe_in_base`. Guaranteed superset of
    * the exact anti-join's in-base verdicts (no false negatives); BloomSpec
    * quantifies the FP rate. The base side is one scan + one single-row
    * aggregation; the batch side is a PROJECTION — compare the exact
    * twin's per-run base⋈batch shuffle. */
  def bloomIncremental(base: DataFrame, batch: DataFrame,
                       mBits: Int = 1 << 16, kHashes: Int = 5): DataFrame = {
    val fp = TextAnalysis.prefixFingerprint(col("text"))
    val bits = buildBits(graft.etl.Tables.fanOut(base), fp, mBits, kHashes)
    graft.etl.Tables.fanOut(batch)
      .select(col("doc_id"), fp.as("fp"))
      .select(col("doc_id"), col("fp"),
        memberExpr(col("fp"), bits, mBits, kHashes).as("maybe_in_base"))
  }
}
