package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs after dedup:
  * doc-level keep/drop rules, deterministic stratified sampling, and
  * token-budget dataset packing. All three are oracle-checked (plain
  * aggregates / window arithmetic — no engine-specific primitives).
  */
object Curation {

  /** Deterministic exact-k per-stratum sample (the reservoir shape,
    * derandomized): the k docs with the smallest md5(doc_id) hash per lang,
    * ranked in hash order. A `Window.partitionBy(lang)` would funnel each
    * whole language into one task at corpus scale; the bounded-heap
    * [[graft.functions.TopKAggregator]] ships at most k candidates per lang
    * per map task, so the sample cost is O(strata × k) past the scan no
    * matter how skewed the strata. The 32-bit hash is exact in the
    * aggregator's Double score; ties break by doc_id, same as the SQL. */
  def sampleExactK(docs: DataFrame, k: Int = 20): DataFrame = {
    val hash = PortableDedup.md5Hash32(col("doc_id").cast("string"))
    val agg = udaf(new graft.functions.TopKAggregator(k))
    docs.select(col("doc_id"), col("lang"), hash.as("h"))
      .groupBy(col("lang"))
      .agg(agg(col("doc_id"), -col("h").cast("double")).as("topk"))
      .select(col("lang"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("s.id").as("doc_id"), col("lang"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  /** Deterministic weighted per-stratum sample via priority sampling
    * (Duffield–Lund–Thorup, "Priority sampling for estimation of arbitrary
    * subset sums", JACM 2007): each doc gets priority w / u where w = its
    * token count and u = a hash-derived uniform in (0, 1]; the k
    * highest-priority docs per language are a length-weighted sample
    * without replacement (long docs proportionally more likely — the
    * corpus-mixing shape where sampling by doc undersamples by token).
    * Derandomized like [[sampleExactK]]: u is a pure function of doc_id,
    * so re-runs, late data, and the DuckDB oracle agree row-for-row. The
    * priority itself crosses engines bit-exactly — (h+1)/2^32 only shifts
    * the exponent and w/u is a single IEEE-rounded division; no libm.
    * Same bounded-heap scale shape as sampleExactK: at most k candidates
    * per lang per map task, O(strata × k) past the scan. */
  def sampleWeighted(docs: DataFrame, k: Int = 20): DataFrame = {
    val h = PortableDedup.md5Hash32(col("doc_id").cast("string"))
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    val w = size(TextAnalysis.tokens(col("text"))).cast("double")
    val agg = udaf(new graft.functions.TopKAggregator(k))
    docs.select(col("doc_id"), col("lang"), (w / u).as("pri"))
      .groupBy(col("lang"))
      .agg(agg(col("doc_id"), col("pri")).as("topk"))
      .select(col("lang"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("s.id").as("doc_id"), col("lang"), col("s.score").as("pri"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  /** Deterministic train/val/test split assignment (90/5/5 by hash bucket)
    * with the per-source audit counts a pipeline reviews before shipping a
    * split: membership is a pure function of doc_id, so re-runs, late data
    * and multi-table joins all agree on every doc's split. */
  def splitCounts(docs: DataFrame): DataFrame = {
    val bucket = PortableDedup.md5Hash32(col("doc_id").cast("string")) % 100
    docs.select(col("source"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Temperature-scaled source mixing (the multinomial sampling weights a
    * multi-source training run uses so small sources aren't drowned):
    * w_s = n_tokens_s^α with α = 0.5, p_s = w_s / Σ w, and each source's
    * token allocation under a global budget. One partial-aggregated
    * shuffle of (source) keys; the Σ w total is a 1-row broadcast, never
    * an unpartitioned window. √ is IEEE-correctly-rounded in both engines
    * and the 6dp-rounded weights sum as exact DECIMALs, so p is
    * bit-identical cross-engine. */
  def mixTemperature(docs: DataFrame, budget: Long = 1000000L): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(size(toks)).as("n_tokens"))
      .withColumn("w", round(sqrt(col("n_tokens").cast("double")), 6))
    val totals = per.agg(
      sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
        .cast("double").as("tot_w"))
    per.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("w") / col("tot_w"), 6).as("p"),
        floor(round(col("w") / col("tot_w"), 6) * budget).cast("bigint")
          .as("alloc_tokens"))
  }

  /** Cross-split leakage audit: near-duplicate documents (8-token-prefix
    * fingerprint) that land in MORE than one train/val/test split — the
    * exact check a benchmark-hygiene pass runs after [[splitCounts]]'s
    * assignment. Groups on a 16-byte fingerprint; per-group state is the
    * ≤3-element split set, so the shuffle carries hashes, not text. */
  def splitLeakage(docs: DataFrame): DataFrame = {
    val bucket = PortableDedup.md5Hash32(col("doc_id").cast("string")) % 100
    val fp = TextAnalysis.prefixFingerprint(col("text"))
    docs.select(fp.as("fp"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .groupBy(col("fp"))
      .agg(countDistinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_splits") >= 2)
  }

  /** Semantic decontamination: train embeddings too close (cosine) to ANY
    * held-out embedding — the screen that catches paraphrased benchmark
    * leakage [[contamination]]'s n-gram overlap can't see. Split is the
    * same pure doc-hash function as [[splitCounts]] (train <90, holdout
    * >=90), so the screen composes with every other split-keyed audit.
    *
    * Scale posture: the holdout side is bounded by construction (eval
    * suites are thousands of rows while train is the corpus), so it is
    * EXPLICITLY broadcast and the corpus streams through map-side — a
    * BroadcastNestedLoopJoin is the intended plan here (each train vector
    * must be screened against every eval vector; the work is the
    * irreducible |train|·|eval| dot products, with zero shuffle of the
    * train side). For very large holdouts, pre-cluster the eval side and
    * screen against centroids first ([[Dedup.semanticDedup]]'s shape). */
  def semanticContamination(emb: DataFrame, threshold: Double = 0.2): DataFrame = {
    val bucket = PortableDedup.md5Hash32(col("vec_id").cast("string")) % 100
    val e = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"), bucket.as("bucket"))
    val cos = round(Similarity.dot(col("a.embedding"), col("b.embedding")) /
      (col("a.nrm") * col("b.nrm")), 6)
    e.filter(col("bucket") < 90).as("a")
      .join(broadcast(e.filter(col("bucket") >= 90).as("b")), cos >= threshold)
      .select(col("a.vec_id").as("train_id"), col("b.vec_id").as("eval_id"),
        cos.as("cosine"))
  }

  /** Train/eval n-gram contamination check (the decontamination pass every
    * training pipeline runs before a benchmark split ships): for each eval
    * document (deterministic split: doc_id % 10 == 0), how many train
    * documents share at least one word-k-shingle with it, and how many of
    * its shingles are contaminated. Shingles are the codegen'd 8-byte
    * md5-prefix hashes ([[PortableDedup.shingleHashes]]), so the join and
    * both shuffles carry longs, never window strings. Shingles present in
    * more than `maxTrainDf` train docs (boilerplate: "terms of service",
    * stopword runs) are excluded — standard practice, and the skew guard:
    * without it one viral n-gram joins every eval doc to millions of train
    * docs. The df filter is one extra partial-agg over the already-hashed
    * train side; eval side joins df-bounded buckets only. */
  def contamination(docs: DataFrame, k: Int = 3,
                    maxTrainDf: Long = 1000L): DataFrame = {
    val sh = PortableDedup.shingleHashes(docs, k)
    val isEval = col("doc_id") % 10 === 0
    val train = sh.filter(!isEval).withColumnRenamed("doc_id", "train_doc")
    val bounded = train
      .groupBy(col("x"))
      .agg(countDistinct(col("train_doc")).as("df"))
      .filter(col("df") <= maxTrainDf)
      .select(col("x"))
    val evalSh = sh.filter(isEval)
    evalSh.join(train.join(bounded, Seq("x")), Seq("x"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("train_doc")).as("n_train_docs"),
        countDistinct(col("x")).as("n_shared"))
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  /** PII scrub (the C4-style cleaning pass): count emails / IPv4s /
    * phone-shaped runs on the RAW text (independent counts, so pattern
    * overlap cannot make the result order-dependent), then redact in a
    * fixed order and report the cleaned length. Pure per-row codegen'd
    * string ops — no shuffle at all; the patterns stay in the RE2 ∩ Java
    * regex common subset so DuckDB reproduces them exactly. */
  def redactPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      length(regexp_replace(regexp_replace(regexp_replace(col("text"),
        EmailRe, "<PII>"), Ipv4Re, "<PII>"), PhoneRe, "<PII>"))
        .cast("long").as("clean_len"))

  /** Gopher-style document filter rules (Rae et al. 2021 §A1.1 shape):
    * token count, mean word length, top-token repetition ratio, type-token
    * counts, and a keep flag from fixed thresholds.
    *
    * Pure per-row projection — ZERO shuffle: every statistic here is a
    * fact about ONE document's token multiset, which by construction fits
    * in the task that read the row, so the two-level explode →
    * groupBy(doc, token) → groupBy(doc) formulation (retained below as the
    * equivalence reference) paid two corpus-wide exchanges to regroup rows
    * that started out together. The codegen'd
    * [[org.apache.spark.sql.graft.TokenStats]] computes all four counts in
    * one hash-map pass per document. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val base = graft.etl.Tables.fanOut(docs, col("doc_id"))
      .select(col("doc_id"),
        TextAnalysis.tokenStatsCol(TextAnalysis.tokens(col("text"))).as("ts"))
      .select(col("doc_id"), col("ts.n_tokens").as("n_tokens"),
        col("ts.n_distinct").as("n_distinct"), col("ts.sum_len").as("sum_len"),
        col("ts.top_c").as("top_c"))
    val meanLen = col("sum_len").cast("double") / col("n_tokens")
    val topRatio = col("top_c").cast("double") / col("n_tokens")
    base.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
      meanLen.as("mean_word_len"), topRatio.as("top_token_ratio"),
      keepFlag(col("n_tokens"), meanLen, topRatio).as("keep_flag"))
  }

  /** The Gopher keep decision as a bare column expression, shared with the
    * model-evaluation queries (which compute it INSIDE the scoring
    * projection instead of joining back to [[gopherRules]]). */
  private[graft] def keepFlag(nTokens: org.apache.spark.sql.Column,
                              meanLen: org.apache.spark.sql.Column,
                              topRatio: org.apache.spark.sql.Column) =
    when(nTokens >= 30 && meanLen.between(3, 6) && topRatio <= 0.15,
      1L).otherwise(0L)

  /** The explode + two-level-aggregate formulation gopherRules replaced —
    * retained as the equivalence-spec reference model only. */
  private[graft] def gopherRulesViaAgg(docs: DataFrame): DataFrame = {
    val t = graft.etl.Tables.fanOut(docs)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val perTok = t.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val perDoc = perTok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * length(col("tok"))).as("sum_len"),
        max(col("c")).as("top_c"))
    val meanLen = col("sum_len").cast("double") / col("n_tokens")
    val topRatio = col("top_c").cast("double") / col("n_tokens")
    perDoc.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
      meanLen.as("mean_word_len"), topRatio.as("top_token_ratio"),
      when(col("n_tokens") >= 30 && meanLen.between(3, 6) && topRatio <= 0.15,
        1L).otherwise(0L).as("keep_flag"))
  }

  /** Deterministic stratified sampling by language: keep a doc iff its
    * md5-derived bucket (0..999) falls under the language's rate — here the
    * dominant language downsampled 10%, the rest 50% (the usual corpus
    * rebalancing move). Pure stateless filter: no shuffle, no RNG state,
    * reproducible across runs and engines, and the predicate is
    * pushdown-eligible at the scan. */
  def stratifiedSample(docs: DataFrame): DataFrame = {
    val bucket = PortableDedup.md5Hash32(col("doc_id").cast("string")) % 1000
    val rate = when(col("lang") === "en", 100L).otherwise(500L)
    docs.filter(bucket < rate)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Training-sequence packing: conceptually concatenate each language's
    * docs in doc_id order into one token stream and chunk it into
    * fixed-`seqLen` training sequences; every doc reports the sequence it
    * starts in (`seq_id`) and its offset inside it (`seq_offset`), i.e.
    * cum_before = Σ n_tokens over same-lang docs with lower doc_id,
    * seq_id = cum_before div seqLen, seq_offset = cum_before mod seqLen.
    *
    * This is a PREFIX SCAN over each whole language — the one shape
    * `Window.partitionBy(lang)` cannot de-skew, since every row needs the
    * sum of ALL its predecessors. So it runs as the classic two-pass
    * distributed scan instead: range-partition by (lang, doc_id) — global
    * order is preserved ACROSS partitions, so a partition holds a
    * contiguous slice of one or more languages — then (1) a partition-local
    * pass reduces each partition to its per-language token totals (a
    * partitions × languages table, driver-tiny at any corpus size), (2) the
    * driver prefix-sums those totals in partition order into each
    * partition's base offset per language, (3) a second partition-local
    * pass streams the rows adding base + running sum. No task ever sees
    * more than one partition's rows; the only full-data exchange is the
    * range repartition itself. `localCheckpoint` pins the sampled range
    * boundaries so both passes iterate the SAME physical partitions. */
  def packSequences(docs: DataFrame, seqLen: Long = 512L): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be positive, got $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val parted = docs.select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .repartitionByRange(col("lang"), col("doc_id"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .as[(Long, String, Long)]
      .localCheckpoint()
    val partSums = parted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { case (_, lang, n) =>
        sums.update(lang, sums.getOrElse(lang, 0L) + n) }
      sums.iterator.map { case (lang, s) => (pid, lang, s) }
    }.collect()
    val offsets: Map[(Int, String), Long] = {
      val running = scala.collection.mutable.HashMap.empty[String, Long]
      partSums.sortBy(_._1).map { case (pid, lang, s) =>
        val base = running.getOrElse(lang, 0L)
        running.update(lang, base + s)
        ((pid, lang), base)
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    parted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val running = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { case (docId, lang, n) =>
        val before = running.getOrElse(lang,
          bc.value.getOrElse((pid, lang), 0L))
        running.update(lang, before + n)
        (docId, lang, n, before / seqLen, before % seqLen)
      }
    }.toDF("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
  }

  /** Exact global quantile tiers over an integer metric (doc length),
    * without a global sort, window, or percentile buffer: the value
    * HISTOGRAM (one partial-agg'd shuffle of |distinct lengths| rows —
    * bounded by the max doc length, not the corpus size) collects to the
    * driver, integer-arithmetic "lower quantile" cutoffs (smallest value
    * with cum·tiers ≥ n·t — no floats anywhere, so the oracle reproduces
    * them bit-exactly by construction) broadcast back as literals, and
    * tier assignment is a stateless projection. The usual
    * `ntile(10) OVER (ORDER BY …)` formulation funnels the entire corpus
    * through one task; this touches each row twice with map-side work
    * only. */
  def lengthTiers(docs: DataFrame, tiers: Int = 10): DataFrame = {
    require(tiers >= 2, s"lengthTiers: need at least 2 tiers, got $tiers")
    val withN = graft.etl.Tables.fanOut(docs).select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val hist = withN.groupBy(col("n_tokens")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.map(_._2).sum
    if (n == 0L) // empty corpus: no cutoffs to compute, empty profile out
      return withN.select(col("doc_id"), col("n_tokens"), lit(1L).as("tier"))
        .limit(0)
    val cum = hist.scanLeft(0L)(_ + _._2).tail
    val cutoffs = (1 until tiers).map { t =>
      val idx = cum.indexWhere(c => c * tiers >= n * t)
      hist(idx)._1
    } // duplicated cutoffs (degenerate distributions) deliberately kept:
      // a doc above a twice-repeated cutoff advances two tiers, so tier
      // numbering matches the count-of-cutoffs-below oracle formulation
    val tierCol = cutoffs.foldLeft(lit(1L)) { (acc, c) =>
      acc + when(col("n_tokens") > lit(c), lit(1L)).otherwise(lit(0L))
    }
    withN.select(col("doc_id"), col("n_tokens"),
      tierCol.cast("long").as("tier"))
  }

  /** Write packed training sequences ([[packSequences]] output shape) as
    * size-bounded parquet shards — the artifact a training loader consumes.
    * `repartitionByRange(lang, seq_id)` co-locates every sequence's docs in
    * one task — a loader that consumes one task's shard group (one
    * `part-NNNNN` prefix) always sees whole sequences — and range
    * boundaries keep tasks balanced regardless of language skew;
    * `sortWithinPartitions` makes in-shard order deterministic, so a
    * re-run byte-reproduces the shards; `maxRecordsPerFile` caps shard
    * size without an extra job; hive `partitionBy(lang)` lets a loader
    * prune to one language without listing the rest. */
  def writeShards(packed: DataFrame, outDir: String,
                  maxRecordsPerFile: Long = 100000L): Unit =
    packed
      .repartitionByRange(col("lang"), col("seq_id"))
      .sortWithinPartitions(col("lang"), col("seq_id"), col("seq_offset"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("lang")
      .parquet(outDir)

  /** Token-budget packing: per language, admit docs best-quality-first
    * (ties broken by doc_id) until the running token total exceeds the
    * budget.
    *
    * Two-phase admission, because a single
    * `Window.partitionBy(lang).orderBy(quality desc)` cumsum funnels every
    * doc of a language through ONE task — and real corpora are 50-90% one
    * language. Phase 1 aggregates a per-(lang, quality_score) token
    * histogram (strata × score-levels rows — tiny at any corpus size) and
    * window-sums it into each score group's admission prefix (the tokens
    * of all strictly-better groups). Phase 2 broadcast-joins that prefix
    * back and STATELESSLY discards every group whose prefix already
    * exceeds the budget — sound because a doc's true cumsum is ≥ its
    * group's prefix, and dropping whole groups (contiguous blocks of the
    * admission order) can't perturb the cumsum of the rows kept. Only the
    * survivors — bounded by the budget plus the boundary score group —
    * reach the per-lang window cumsum that emits the exact `cum_tokens`.
    * Degenerate corpora where one (lang, score) group dominates still
    * bound that window's input to ONE score group, never the language. */
  def budgetPack(docs: DataFrame, budget: Long = 2000L): DataFrame = {
    val q = TextAnalysis.qualityScore(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val byGroup = Window.partitionBy(col("lang"))
      .orderBy(col("quality_score").desc)
    val prefixes = q.groupBy(col("lang"), col("quality_score"))
      .agg(sum(col("n_tokens")).as("grp_tokens"))
      .withColumn("grp_prefix",
        coalesce(sum(col("grp_tokens")).over(byGroup) - col("grp_tokens"), lit(0L)))
      .filter(col("grp_prefix") <= budget)
      .select(col("lang"), col("quality_score"), col("grp_prefix"))
    // within-GROUP running sum only (the cross-group part is the prefix);
    // whole groups survive or drop together, so the per-group cumsum over
    // survivors is exactly the original per-lang cumsum restricted to them
    val w = Window.partitionBy(col("lang"), col("quality_score"))
      .orderBy(col("doc_id").asc)
    q.join(broadcast(prefixes), Seq("lang", "quality_score"))
      .withColumn("cum_tokens", col("grp_prefix") +
        sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"), col("cum_tokens"))
  }

  /** Per-domain frequency cap (the Common-Crawl curation rule that stops
    * one mega-domain from dominating a corpus): keep at most `cap` docs
    * per source, chosen by deterministic hash priority (ties by doc_id).
    * The `rn <= cap` filter over a ranked window engages Spark's
    * WindowGroupLimit pushdown — each MAP task keeps at most `cap` rows
    * per source before the exchange, so the shuffle carries
    * O(sources × cap × tasks) rows and a mega-domain never funnels its
    * full row set through one reducer's sort. */
  /** Duplicate-rate planning table: per source, how much of the crawl is
    * exact-duplicate mass — the number that decides whether a source gets
    * the expensive near-dup pass at all and predicts the post-dedup token
    * budget. One partial-aggregated groupBy per source; count(distinct)
    * over the 16-byte content hash, never the text. dup_rate is one
    * terminal division of exact BIGINTs — bit-exact cross-engine. */
  def dedupRateBySource(docs: DataFrame): DataFrame =
    graft.etl.Tables.fanOut(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        ((col("n_docs") - col("n_unique")).cast("double") /
          col("n_docs").cast("double")).as("dup_rate"))

  def domainCap(docs: DataFrame, cap: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(PortableDedup.md5Hash32(col("doc_id").cast("string")),
        col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= cap)
  }

  /** Deterministic global shuffle for training order, expressed scale-out:
    * the total order is the composite (shard, pos), where shard =
    * hash(doc_id) % `shards` and pos ranks hash order within the shard. A
    * literal `row_number() OVER (ORDER BY hash)` would funnel the whole
    * corpus through ONE task's sort; sharding first makes each shard an
    * independent window — size `shards` so a shard fits a task's
    * spillable sort (10⁴ shards at 100 TB ≈ 10 GB each), and a writer can
    * emit all shards in parallel, each internally hash-ordered. Epoch
    * reshuffles = bump the seed baked into the hashed string. */
  def globalShuffle(docs: DataFrame, shards: Int = 16): DataFrame = {
    val h = PortableDedup.md5Hash32(col("doc_id").cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", col("h") % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Shard-balance report for the hash sharding [[globalShuffle]] uses:
    * docs and chars per shard — the check that hash sharding actually
    * yields near-equal training shards (expected imbalance at n docs over
    * s shards is O(√(s/n)) relative). Pure map + one partial-aggregated
    * shuffle of `shards` keys; nothing about the corpus is collected. */
  def shardStats(docs: DataFrame, shards: Int = 16): DataFrame =
    docs.select(
        (PortableDedup.md5Hash32(col("doc_id").cast("string")) % shards)
          .as("shard"),
        col("n_chars"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
}
