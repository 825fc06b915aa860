package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification (the Deequ pattern: a rule set
  * compiled into ONE metrics pass, not one job per rule) — the admission
  * gate a pipeline runs over a new drop before letting it near training.
  *
  * Three check families, each a registered query:
  *  - [[checkRules]]: per-row predicate rules folded into a single
  *    aggregation (one scan however many rules; Spark plans the
  *    conditional counts as map-side partials, so the exchange carries one
  *    row per task regardless of table size).
  *  - [[referential]]: orphan counts for a child→parent key relation via
  *    LEFT ANTI join on the KEY COLUMN ONLY — wide rows never shuffle, and
  *    AQE broadcasts the parent side when it is dimension-sized. At 100 TB
  *    a bloom pre-screen (see [[Bloom]]) cuts the anti-join's shuffle to
  *    the candidate-orphan stripe; the exact anti-join stays the gate.
  *  - [[keyUniqueness]]: count vs distinct-count per declared key — the
  *    duplicate-key alarm. One partial-aggregated shuffle on the key.
  *
  * NULL semantics are the engines' shared three-valued logic: a rule
  * predicate that evaluates NULL (e.g. a range test over a NULL value)
  * counts as NOT violated — callers wanting NULL-rejection declare an
  * explicit `isNull` rule; the oracle SQL writes the identical CASE.
  */
object Checks {

  /** One row per rule: (rule_id, n_rows, n_violations, pass 0/1). Rule ids
    * are free-form display strings — internal aliases index by POSITION
    * (`__r0`, `__r1`, …) so an id containing a dot (e.g. a range bound)
    * can't be misparsed as a struct-field access by the column resolver. */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules: need at least one rule")
    val aggs = rules.zipWithIndex.map { case ((_, bad), i) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"__r$i")
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stacked = rules.zipWithIndex.map { case ((id, _), i) =>
      val v = coalesce(col(s"__r$i"), lit(0L))
      struct(lit(id).as("rule_id"), col("__total").as("n_rows"),
        v.as("n_violations"),
        when(v === 0, 1L).otherwise(0L).as("pass"))
    }
    row.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }

  /** The fixture's lineitem admission rules — TPC-H's own invariants. */
  def lineitemRules(li: DataFrame): DataFrame = checkRules(li, Seq(
    "orderkey_not_null" -> col("l_orderkey").isNull,
    "quantity_1_50" -> !(col("l_quantity") >= 1 && col("l_quantity") <= 50),
    "discount_0_0.1" -> !(col("l_discount") >= 0 && col("l_discount") <= 0.1),
    "tax_0_0.08" -> !(col("l_tax") >= 0 && col("l_tax") <= 0.08),
    "extendedprice_pos" -> !(col("l_extendedprice") > 0),
    "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R")))

  /** Admission rules for the `documents` corpus — the drop-gate the
    * LLM-pipeline queries (dedup/quality/packing) assume: non-empty text,
    * a self-consistent n_chars, closed language + source domains, and a
    * sane length ceiling (a 10 MB "document" is a concatenation bug, not
    * a document). */
  def documentsRules(docs: DataFrame): DataFrame = checkRules(docs, Seq(
    "doc_id_not_null" -> col("doc_id").isNull,
    "text_not_empty" -> (length(col("text")) === 0),
    "nchars_consistent" -> (col("n_chars") =!= length(col("text"))),
    "lang_domain" -> !col("lang").isin("de", "en", "es", "fr", "zh"),
    "source_format" -> !col("source").rlike("^src[0-9]+$"),
    "nchars_1_10000" -> !(col("n_chars") >= 1 && col("n_chars") <= 10000)))

  /** Admission rules for the `events` stream: ids present, timestamps
    * inside the retention window, a closed event-type domain, positive
    * values, non-negative user ids. Exposed as a value so the streaming
    * twin can fold the SAME rule set per micro-batch: the metrics are a
    * tiny mergeable vector (counts add across batches/shards), which is
    * what makes the gate cheap on a continuous ingest. */
  val eventsRuleSet: Seq[(String, Column)] = Seq(
    "event_id_not_null" -> col("event_id").isNull,
    "ts_in_retention" -> expr(
      "NOT (ts >= TIMESTAMP '2024-01-01 00:00:00' AND " +
        "ts < TIMESTAMP '2025-01-01 00:00:00')"),
    "event_type_domain" -> !col("event_type")
      .isin("click", "error", "purchase", "signup", "view"),
    "value_positive" -> !(col("value") > 0),
    "user_id_nonneg" -> !(col("user_id") >= 0))

  def eventsRules(events: DataFrame): DataFrame =
    checkRules(events, eventsRuleSet)

  /** Orphan count for one child→parent relation:
    * (relation, n_rows, n_orphans, pass 0/1). A NULL child key never
    * matches a parent (equality is never true), so it counts as an orphan
    * — the oracle's NOT EXISTS agrees. */
  def referential(child: DataFrame, childKey: String, parent: DataFrame,
                  parentKey: String, relation: String): DataFrame = {
    val orphans = child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    child.agg(count(lit(1)).as("n_rows")).crossJoin(orphans)
      .select(lit(relation).as("relation"), col("n_rows"), col("n_orphans"),
        when(col("n_orphans") === 0, 1L).otherwise(0L).as("pass"))
  }

  /** [[referential]] with the [[Bloom]] pre-screen wired in — the 100 TB
    * form the plain check's Scaladoc promises: the parent keys build an
    * m-bit Bloom filter ONCE (one scan, a single-row OR-merge — the
    * exchange carries m/64-word partials, never keys), and every child key
    * probes it as broadcast codegen arithmetic BEFORE any join. A key the
    * filter rejects is DEFINITELY absent from the parent (Bloom filters
    * have no false negatives) — it is counted an orphan with zero shuffle.
    * Only the maybe-member stripe — true matches plus the (1-e^(-kn/m))^k
    * false-positive sliver — reaches the exact LEFT ANTI join, so the
    * anti-join's exchange shrinks from every child key to approximately
    * the matched population that must be verified anyway. Composition is
    * SOUND, not approximate: false positives only route extra candidates
    * to the exact join, which resolves them — the result is bit-identical
    * to [[referential]], which is exactly this query's oracle. A NULL
    * child key lands on whichever side its (deterministic) probe picks and
    * is an orphan either way: the filter branch counts it directly; the
    * anti-join branch never matches it (NULL equality is never true). */
  def referentialBloom(child: DataFrame, childKey: String, parent: DataFrame,
                       parentKey: String, relation: String,
                       mBits: Int = 0, kHashes: Int = 5): DataFrame =
    referentialBloomDetailed(child, childKey, parent, parentKey, relation,
      mBits, kHashes)
      .select(col("relation"), col("n_rows"), col("n_orphans"), col("pass"))

  /** ~10 bits per parent key at k=5 hashes → FP ≈ (1-e^(-1/2))^5 ≈ 0.94%,
    * rounded up to the bitset's 64-bit word granularity, floored for tiny
    * parents and capped at 2^28 bits (a 32 MB broadcast). Past the cap the
    * FP rate rises — more candidates route to the exact join — but the
    * composition stays exact at every size. */
  private[graft] def bloomSizeFor(parentCount: Long): Int = {
    val raw = math.min(math.max(10L * parentCount, 1L << 16), 1L << 28)
    (((raw + 63) / 64) * 64).toInt
  }

  /** [[referentialBloom]] with its evidence columns kept: n_definite
    * (keys the filter rejected — orphans with zero shuffle), n_stripe
    * (keys that reached the exact anti-join = n_rows − n_definite: the
    * matched population plus the false-positive sliver — the quantity the
    * pre-screen exists to shrink), n_maybe (stripe keys the join still
    * found orphaned), m_bits (the size used). `mBits = 0` (the default)
    * sizes the filter FROM the parent: one cheap count (footer-stats for a
    * parquet parent) → [[bloomSizeFor]] — an undersized filter otherwise
    * degrades silently to the plain anti-join plus pure overhead.
    * ChecksSpec gates the cut: on an orphan-heavy fixture the stripe stays
    * under 5% of child keys at the computed size. */
  def referentialBloomDetailed(child: DataFrame, childKey: String,
                               parent: DataFrame, parentKey: String,
                               relation: String, mBits: Int = 0,
                               kHashes: Int = 5): DataFrame =
    referentialBloomAllDetailed(
      Seq((child, childKey, parent, parentKey, relation)), mBits, kHashes)

  /** Several [[referentialBloomDetailed]] relations as ONE pipeline — the
    * union of the per-relation rows, value-identical to calling the
    * single-relation form per relation and unioning, but with the
    * driver-side setup batched (r21 optimization, guide §1.2/§2.6):
    *  - ALL parent sizing counts run in one action (their scan+aggregate
    *    stages materialize concurrently instead of one blocking action per
    *    relation);
    *  - ALL Bloom bitset builds run in one action, same effect;
    *  - per relation, the row-count branch is FUSED into the
    *    definite-orphan branch as a conditional aggregate over the same
    *    probed key scan (n_rows = count(1), n_definite = count of !maybe)
    *    — one fewer child scan per relation, zero added exchanges (the
    *    r20-reverted shared-exchange variant added two; this adds none).
    * The maybe-stripe anti-join — the query's actual 100 TB story — is
    * untouched. */
  def referentialBloomAllDetailed(
      relations: Seq[(DataFrame, String, DataFrame, String, String)],
      mBits: Int = 0, kHashes: Int = 5): DataFrame = {
    require(relations.nonEmpty, "referentialBloomAll: need >= 1 relation")
    val parentKeyFrames = relations.map { case (_, _, parent, pk, _) =>
      parent.select(col(pk).as("k"))
    }
    // one action for every parent count (bloomSizeFor inputs)
    val ms: Seq[Int] =
      if (mBits > 0) relations.map(_ => mBits)
      else {
        val countsRow = parentKeyFrames.zipWithIndex
          .map { case (pk, i) => pk.agg(count(lit(1)).as(s"__n$i")) }
          .reduce(_.crossJoin(_)).head()
        relations.indices.map(i => bloomSizeFor(countsRow.getLong(i)))
      }
    // one action for every m-bit filter build
    val bitsRow = parentKeyFrames.zip(ms).zipWithIndex.map {
      case ((pk, m), i) =>
        Bloom.buildBitsFrame(pk, col("k"), m, kHashes).toDF(s"__b$i")
    }.reduce(_.crossJoin(_)).head()
    val branches = relations.zip(ms).zipWithIndex.map {
      case (((child, childKey, _, _, relation), m), i) =>
        val parentKeys = parentKeyFrames(i)
        val bits = bitsRow.getSeq[Long](i).toArray
        val member = Bloom.memberExpr(col("k"), bits, m, kHashes)
        val keys = child.select(col(childKey).as("k"), member.as("maybe"))
        // n_rows and the definite-orphan count from ONE probed scan
        // (count(when) ignores the non-matching rows and is 0 on an empty
        // child, exactly like the filter+count branch it replaces)
        val counted = keys.agg(count(lit(1)).as("n_rows"),
          count(when(!col("maybe"), lit(1))).as("n_definite"))
        // the maybe stripe goes through the exact anti-join gate
        val fromJoin = keys.filter(col("maybe")).select(col("k"))
          .join(parentKeys, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_maybe"))
        counted.crossJoin(fromJoin)
          .select(lit(relation).as("relation"), col("n_rows"),
            col("n_definite"),
            (col("n_rows") - col("n_definite")).as("n_stripe"),
            col("n_maybe"), lit(m).as("m_bits"),
            (col("n_definite") + col("n_maybe")).as("n_orphans"),
            when(col("n_definite") + col("n_maybe") === 0, 1L).otherwise(0L)
              .as("pass"))
    }
    branches.reduce(_.union(_))
  }

  /** [[referentialBloom]] over several relations, batched — see
    * [[referentialBloomAllDetailed]]. */
  def referentialBloomAll(
      relations: Seq[(DataFrame, String, DataFrame, String, String)],
      kHashes: Int = 5): DataFrame =
    referentialBloomAllDetailed(relations, 0, kHashes)
      .select(col("relation"), col("n_rows"), col("n_orphans"), col("pass"))

  /** Key-uniqueness metrics per declared (table, key):
    * n_dupes = non-null rows − distinct keys (NULL keys are counted
    * separately, not as duplicates of each other — SQL's DISTINCT would). */
  def keyUniqueness(tables: Seq[(String, DataFrame, String)]): DataFrame = {
    require(tables.nonEmpty, "keyUniqueness: need at least one table")
    tables.map { case (name, df, key) =>
      df.agg(count(lit(1)).as("n_rows"), count(col(key)).as("n_nonnull"),
          countDistinct(col(key)).as("n_distinct"))
        .select(lit(s"$name.$key").as("table_key"), col("n_rows"),
          col("n_distinct"),
          (col("n_nonnull") - col("n_distinct")).as("n_dupes"),
          when(col("n_nonnull") === col("n_distinct"), 1L).otherwise(0L)
            .as("pass"))
    }.reduce(_.union(_))
  }
}
