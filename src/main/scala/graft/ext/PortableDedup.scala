package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-portable twins of the [[Dedup]] scale paths.
  *
  * The production MinHash / SimHash pipelines hash with `xxhash64` — fast,
  * codegen'd, and Spark-specific — so the driver's DuckDB gate could only
  * row-count them. These variants swap ONLY the hash primitive: every hash
  * is derived from md5 hex (bit-identical across Spark and DuckDB) mixed
  * with an affine family (a_i·x + b_i) mod P over plain 64-bit arithmetic
  * both engines share. The ALGORITHMS are unchanged — shingle → min-hash →
  * banded LSH buckets → bucket-local pair expansion → connected components;
  * per-bit token voting for SimHash — so the whole dedup pipeline becomes
  * hash-matchable end-to-end against an independent engine (the cluster
  * oracle is a DuckDB recursive-CTE connected-components query).
  *
  * Scale posture matches the production path: constant-width shuffle keys,
  * one shuffle per stage (explode → groupBy for signatures; one bucket
  * groupBy for candidates), pair fan-out bounded by `maxBucket`, and the
  * codegen'd [[org.apache.spark.sql.graft.SortedPairs]] bucket expansion.
  * Only the per-shingle hash differs (md5 is ~4× the cost of xxhash64 —
  * the price of cross-engine verifiability; use [[Dedup.minhashLsh]] when
  * the oracle isn't needed).
  */
object PortableDedup {

  /** 2^31 − 1 (Mersenne prime) — modulus of the affine hash family. */
  val P: Long = 2147483647L

  /** Affine family coefficients; small enough that a_i·x < 2^52 for
    * x < 2^32, so the product never overflows a signed 64-bit in either
    * engine. Mirrored literally into the oracle SQL. */
  def hashA(i: Int): Long = 7919L * (i + 1) + 7
  def hashB(i: Int): Long = 104729L * (i + 1) + 13

  /** 32-bit value from the first 8 md5 hex chars — DuckDB computes the
    * identical value as `('0x' || substr(md5(s), 1, 8))::BIGINT`. */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Distinct word-k-shingle hashes, exploded to (doc_id, x) rows via the
    * codegen'd [[org.apache.spark.sql.graft.Md5ShingleHashes]] (the
    * composed `explode(shingles(...))` + md5Hash32 form builds window
    * strings through an interpreted HOF lambda; equivalence is pinned in
    * PortableDedupSpec). The shuffle that follows carries 8-byte hashes.
    * Docs shorter than k tokens emit no windows — same exclusion as the
    * oracle SQL's len >= k guard. */
  // NOT keyed by doc_id (unlike simhashSig below): shingleHashes fans out
  // to SEVERAL consumers inside one query (signatures + sorted sets +
  // truth-pair join + sizes in jaccardEstimates / lshQuality /
  // substringSpans), and the downstream ENSURE exchanges are the plan's
  // only ReusedExchange points — keying here removes them and DUPLICATES
  // the md5-shingle explode per consumer (measured 6.8× on
  // dedup_jaccard_est in r20's optimization pass).
  private[graft] def shingleHashes(docs: DataFrame, k: Int): DataFrame =
    graft.etl.Tables.fanOut(docs)
      .select(col("doc_id"), explode(
        org.apache.spark.sql.GraftColumnBridge.column(
          org.apache.spark.sql.graft.Md5ShingleHashes(
            org.apache.spark.sql.GraftColumnBridge.expression(
              TextAnalysis.tokens(col("text"))), k))).as("x"))

  /** The composed-builtins formulation Md5ShingleHashes replaced — retained
    * as the equivalence-spec reference model only. */
  private[graft] def shingleHashesViaHof(docs: DataFrame, k: Int): DataFrame =
    graft.etl.Tables.fanOut(docs)
      .filter(size(TextAnalysis.tokens(col("text"))) >= k)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), k)).as("s"))
      .select(col("doc_id"), md5Hash32(col("s")).as("x"))

  /** MinHash signature: mh_i = min over shingles of (a_i·x + b_i) mod P.
    * All `numHashes` components in ONE explode + ONE groupBy shuffle. */
  def minhashSig(docs: DataFrame, k: Int = 2, numHashes: Int = 8): DataFrame = {
    val sh = shingleHashes(docs, k)
    val aggs = (0 until numHashes).map(i =>
      min((lit(hashA(i)) * col("x") + lit(hashB(i))) % P).as(s"mh_$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded-LSH candidate pairs over the portable signature. Band key =
    * mh_{2b}·P + mh_{2b+1} (Horner over the band's rows; < P·(P+1) < 2^62).
    * Docs sharing any band key are candidates; buckets above `maxBucket`
    * (degenerate content) are dropped, as in the production path. */
  def lshPairs(docs: DataFrame, k: Int = 2, bands: Int = 4,
               rowsPerBand: Int = 2, maxBucket: Int = 1000): DataFrame = {
    require(rowsPerBand <= 2, "band key packing overflows past 2 rows/band")
    val sig = minhashSig(docs, k, bands * rowsPerBand)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        (0 until rowsPerBand)
          .map(r => col(s"mh_${b * rowsPerBand + r}"))
          .reduceLeft((acc, c) => acc * P + c)
      }: _*)).as(Seq("band", "bucket")))
    val buckets = banded.groupBy(col("band"), col("bucket"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val pairsCol = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.graft.SortedPairs(
        org.apache.spark.sql.GraftColumnBridge.expression(col("ids"))))
    buckets.select(explode(pairsCol).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** Near-dup clusters from the portable LSH pairs — same min-label
    * propagation as the production path ([[Dedup.canonicalClusters]]);
    * the oracle is a recursive-CTE transitive closure in DuckDB. */
  def clusters(docs: DataFrame): DataFrame =
    Dedup.canonicalClusters(lshPairs(docs))

  /** The corpus that SURVIVES near-dup dedup: every document keeps its row
    * unless it sits in a near-dup cluster and is not the cluster's
    * canonical (min-id) member. The dropped side carries 8-byte ids only
    * — no hint: web-corpus dup fractions run 30-50%, so AQE must pick
    * broadcast vs shuffled anti join from the measured size. This is the
    * end-to-end payoff of X2/X2e-f: labels in, training corpus out. */
  def survivors(docs: DataFrame): DataFrame = {
    val dropped = clusters(docs)
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"))
    docs.join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"))
  }

  /** MinHash Jaccard ESTIMATE vs exact truth, per LSH candidate pair —
    * the estimator-quality diagnostic a dedup pipeline runs when tuning
    * (bands, rowsPerBand, numHashes): est = matching signature components
    * / numHashes (the classic unbiased MinHash estimator), truth = exact
    * Jaccard over the distinct shingle-hash sets (two-pointer codegen'd
    * [[org.apache.spark.sql.graft.SortedIntersectCount]]). BOTH columns
    * are oracle-gated bit-exactly: est is an integer over a power of two,
    * truth is one terminal integer division — so the estimator's ERROR
    * itself is cross-engine verified, not just the pipeline output.
    *
    * Scale: pairs are LSH-bounded; per-side signature+set tables join on
    * 8-byte ids with no broadcast hint (corpus-scale side — AQE picks the
    * build side from runtime stats, same posture as verifyJaccard). */
  def jaccardEstimates(docs: DataFrame, k: Int = 2,
                       numHashes: Int = 8): DataFrame = {
    val pairs = lshPairs(docs, k)
    val side = minhashSig(docs, k, numHashes)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
      .join(shingleHashes(docs, k).groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("x"))).as("xs")), Seq("doc_id"))
    val matches = (1 to numHashes).map(i =>
      when(element_at(col("sa.sig"), i) === element_at(col("sb.sig"), i), 1)
        .otherwise(0)).reduce(_ + _)
    val inter = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.graft.SortedIntersectCount(
        org.apache.spark.sql.GraftColumnBridge.expression(col("sa.xs")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("sb.xs"))))
    pairs
      .join(side.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(side.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / numHashes).as("est_jaccard"),
        (inter.cast("double") /
          (size(col("sa.xs")) + size(col("sb.xs")) - inter)).as("jaccard"))
  }

  /** LSH QUALITY AUDIT, one row: precision and recall of the portable
    * banded candidates against the exact shingle-Jaccard truth at
    * `threshold` — "measure, don't guess" applied to the dedup pipeline
    * itself. A pipeline tuning (bands, rowsPerBand, threshold) reads this
    * query per corpus instead of trusting the S-curve formula, because
    * real corpora violate the uniformity the formula assumes.
    *
    * Every output is exact: the truth set is the all-pairs posting join
    * over the SAME distinct-shingle-hash universe LSH signs (so the audit
    * measures the banding, not tokenizer drift), counts are BIGINTs, and
    * precision/recall are one terminal division each — bit-exact against
    * the oracle. Scale: the truth join is the bounded audit cost (run on
    * a sample at 100 TB, like `dedup_jaccard` does with its 10% stripe);
    * the candidate side is the production LSH pipeline unchanged. */
  def lshQuality(docs: DataFrame, k: Int = 2,
                 threshold: Double = 0.3): DataFrame = {
    val cands = lshPairs(docs, k)
    val sh = shingleHashes(docs, k)
    val truthPairs = sh.as("a").join(sh.as("b"),
        col("a.x") === col("b.x") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val truth = truthPairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("i").cast("double") / (col("na") + col("nb") - col("i"))
        >= threshold)
      .select(col("doc_a"), col("doc_b"))
    // all three counts from ONE pass (r21, guide §2.4): both sides are
    // pair-unique (cands is distinct(), truth is a groupBy), so a full
    // outer join on the pair key counts candidates, truths and their
    // intersection in a single aggregate — the previous three count
    // branches (nTp join + nCand + nTrue) re-evaluated the LSH pipeline
    // and the posting self-join once per branch past the reuse points
    // (22 parquet scans in the executed plan; 11 after)
    val joined = cands.withColumn("c", lit(1))
      .join(truth.withColumn("t", lit(1)), Seq("doc_a", "doc_b"), "full")
    joined.agg(count(col("c")).as("n_candidates"),
        count(col("t")).as("n_true"),
        count(when(col("c").isNotNull && col("t").isNotNull, lit(1)))
          .as("n_tp"))
      .select(col("n_candidates"), col("n_true"), col("n_tp"),
        (col("n_tp").cast("double") / col("n_candidates").cast("double"))
          .as("prec"),
        (col("n_tp").cast("double") / col("n_true").cast("double"))
          .as("rec"))
  }

  /** Substring-span dedup diagnostic (the Lee et al. "Deduplicating
    * Training Data Makes Language Models Better" signal at span rather
    * than document granularity): a k-token window is DUPLICATED if it
    * occurs in ≥ 2 distinct documents; each doc reports its distinct
    * window count, how many of those windows are duplicated, and the
    * duplicated fraction — the per-doc statistic a pipeline thresholds to
    * drop boilerplate-heavy documents that whole-doc MinHash misses.
    * Fully oracle-exact: windows hash through the same portable md5
    * family, and dup_frac is one terminal division of exact integers.
    *
    * Scale: the corpus is reduced to (doc_id, window-hash) 16-byte rows at
    * the scan (codegen'd [[org.apache.spark.sql.graft.Md5ShingleHashes]]);
    * the shared-hash table is a partial-aggregated groupBy on the 8-byte
    * hash, and the join back is hash-key-only with no hint — the dup-hash
    * side is usually a small fraction of the corpus, so AQE broadcasts it
    * when measured small and shuffles both sides otherwise. Text never
    * shuffles. Docs shorter than k tokens emit no windows and no row,
    * mirrored by the oracle's len >= k guard. */
  def substringSpans(docs: DataFrame, k: Int = 5): DataFrame = {
    val sh = shingleHashes(docs, k)
    val shared = sh.groupBy(col("x"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("x"), lit(1L).as("is_dup"))
    sh.join(shared, Seq("x"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_windows"))
  }

  /** Portable SimHash: bit b (b < bits) of the signature is the sign of
    * Σ_tokens (2·bit_b(md5Hash32(token)) − 1), multiplicity included —
    * identical to [[Dedup.simhash]] but over the portable token hash and
    * 32 bits (the md5-prefix width). One explode + one groupBy. */
  def simhashSig(docs: DataFrame, bits: Int = 32): DataFrame = {
    val t = graft.etl.Tables.fanOut(docs, col("doc_id"))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), md5Hash32(col("tok")).as("h"))
    val bitSums = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s_$b"))
    val sums = t.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map(b =>
      when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** Exact embedding near-dup pairs on a deterministic id-sample: all pairs
    * with round(cosine, 6) ≥ threshold. This is the oracle baseline for
    * [[Dedup.embeddingNearDup]] — the sign-LSH bucketed path is the scale
    * path; this one is O(n²/mod²) and exists to be hash-matched (DuckDB
    * `list_dot_product` over DOUBLE[] reproduces the fold exactly). */
  def embeddingPairsExact(emb: DataFrame, threshold: Double,
                          sampleMod: Int = 2): DataFrame = {
    val e = graft.etl.Tables.fanOut(emb)
      .filter(col("vec_id") % sampleMod === 0)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val cos = Similarity.dot(col("a.embedding"), col("b.embedding")) /
      (col("a.nrm") * col("b.nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cos, 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
