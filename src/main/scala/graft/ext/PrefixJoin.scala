package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X2: exact-Jaccard set-similarity self-join via frequency-ordered prefix
  * filtering (Bayardo, Ma, Srikant — "Scaling Up All Pairs Similarity
  * Search", WWW 2007) tightened with PPJoin's positional filter (Xiao,
  * Wang, Lin, Yu — "Efficient Similarity Joins for Near Duplicate
  * Detection", WWW 2008).
  *
  * Same ANSWER as the all-pairs token-posting join
  * ([[Dedup.ngramJaccardPairs]], the `dedup_jaccard` oracle): every
  * same-lang pair of docs whose distinct-token Jaccard clears the
  * threshold, with the exact score. Different CANDIDATE generation: the
  * posting join fans out on every shared token — the most frequent token
  * in the corpus defines its fan-out, the classic quadratic hot key — while
  * prefix filtering joins only on each doc's few RAREST tokens and is still
  * lossless.
  *
  * Soundness (prefix lemma): order every doc's distinct tokens by one
  * global canonical order — (document frequency asc, token asc) here, so
  * prefixes hold the rarest tokens. For J(x,y) >= t the overlap O is an
  * integer >= ceil(t*max(|x|,|y|)); the O shared tokens' minimum w1 has at
  * most O-1 shared tokens after it, so w1 sits within the first
  * |x| - O + 1 <= |x| - ceil(t*|x|) + 1 tokens of x, and likewise in y:
  * one equi-join key inside BOTH prefixes is guaranteed. The positional
  * filter re-uses w1: overlap from a prefix match at (1-based) positions
  * (i, j) on is at most 1 + min(|x| - i, |y| - j), which for a true pair
  * must reach alpha = ceil(t/(1+t) * (|x|+|y|)); a pair whose every prefix
  * match fails that bound cannot clear t and is dropped unverified.
  *
  * Scale posture (100 TB corpus):
  *  - the frequency table is token-keyed and JOINED, never broadcast (a
  *    crawl vocabulary outgrows the driver); the rank join + per-doc
  *    rebuild is two shuffles carrying (doc_id, token, count) — no text.
  *  - candidate generation is an equi-join on (prefix token, lang) — no
  *    CartesianProduct / BroadcastNestedLoopJoin (PlanAudit asserts) —
  *    and prefix tokens are the globally rarest per doc, so the worst
  *    join key fans out over documents that share a RARE token, not over
  *    every document containing "the".
  *  - length + positional filters run inside the join condition, before
  *    the pair-level distinct, so pruned candidates never reach the
  *    shuffle; verification (one codegen array_intersect per pair) runs
  *    on surviving distinct pairs only, re-attached by two 8-byte-key
  *    joins sized by AQE.
  *  - float hygiene: every ceil() on a float product under-shoots by 1e-9
  *    first, so IEEE drift (0.2*10 = 2.0000000000000004) can only ever
  *    LENGTHEN a prefix or LOOSEN a bound — more candidates, never a
  *    dropped true pair. The emitted score is the same single-division
  *    double as the oracle's.
  */
object PrefixJoin {

  /** ceil(x) that float error can never round UP past the exact integer
    * (which would shrink a prefix / tighten a filter and silently drop a
    * true pair). Under-shooting only admits extra candidates. */
  private def ceilSound(x: Column): Column = ceil(x - lit(1e-9))

  /** Distinct tokens per doc, ordered by the global canonical order.
    * Package-visible (with [[candidates]]) so the spec can count the
    * candidate set the pruning admits. */
  private[graft] def orderedSets(docs0: DataFrame): DataFrame = {
    val docs = graft.etl.Tables.fanOut(docs0, col("doc_id"))
    val d = docs.select(col("doc_id"), col("lang"),
      array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
    val post = d.select(col("doc_id"), col("lang"),
      explode(col("toks")).as("tok"))
    val freq = post.groupBy("tok").agg(count(lit(1)).as("df"))
    post.join(freq, "tok")
      .groupBy("doc_id", "lang")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
        x => x("tok")).as("ord"))
      .withColumn("n", size(col("ord")))
  }

  /** Candidate pairs after prefix + length + positional filtering, BEFORE
    * exact verification. Package-visible so the spec can assert the
    * pruning actually prunes (vs the full posting join) without weakening
    * the equivalence gate on the public result. */
  private[graft] def candidates(sets: DataFrame, threshold: Double): DataFrame = {
    val p = (col("n") - ceilSound(lit(threshold) * col("n")) + lit(1)).cast("int")
    val pre = sets
      .select(col("doc_id"), col("lang"), col("n"),
        posexplode(slice(col("ord"), lit(1), p)))
      .select(col("doc_id"), col("lang"), col("n"),
        (col("pos") + 1).as("pos"), col("col").as("tok"))
    val tt = threshold / (1.0 + threshold)
    pre.as("a").join(pre.as("b"),
        col("a.tok") === col("b.tok") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id") &&
          // length filter: J >= t forces min(|A|,|B|) >= t * max(|A|,|B|)
          least(col("a.n"), col("b.n")).cast("double") >=
            lit(threshold) * greatest(col("a.n"), col("b.n")) - lit(1e-9) &&
          // positional filter: overlap reachable from this match
          (lit(1) + least(col("a.n") - col("a.pos"),
            col("b.n") - col("b.pos"))) >=
            ceilSound(lit(tt) * (col("a.n") + col("b.n"))))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact same-lang Jaccard pairs at `threshold`, prefix-filtered.
    * Output (doc_a < doc_b, jaccard) — bit-identical to
    * [[Dedup.ngramJaccardPairs]] on any input. */
  def jaccardPairs(docs0: DataFrame, threshold: Double): DataFrame = {
    val sets = orderedSets(docs0)
    // `ord` is a permutation of the distinct-token set, so verification
    // intersects the ordered arrays directly — no second tokenize pass
    val refs = sets.select(col("doc_id"), col("ord"), col("n"))
    val i = size(array_intersect(col("sa.ord"), col("sb.ord")))
    candidates(sets, threshold)
      .join(refs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(refs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (i.cast("double") / (col("sa.n") + col("sb.n") - i)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
