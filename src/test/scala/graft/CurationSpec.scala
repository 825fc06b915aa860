package graft

import graft.ext.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CurationSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    // 40 varied tokens: passes every gopher threshold
    (0L, (1 to 40).map(i => s"word$i").mkString(" "), "en", "s0"),
    // 10 tokens: fails the n_tokens >= 30 rule
    (1L, (1 to 10).map(i => s"word$i").mkString(" "), "en", "s0"),
    // 40 tokens but one token is 20/40 of the doc: fails repetition rule
    (2L, ((1 to 20).map(_ => "spam") ++ (1 to 20).map(i => s"w$i")).mkString(" "),
      "de", "s1")
  ).toDF("doc_id", "text", "lang", "source")

  test("gopherRules: thresholds separate clean, short, and repetitive docs") {
    val out = Curation.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(0L).getAs[Long]("keep_flag") shouldBe 1L
    out(1L).getAs[Long]("keep_flag") shouldBe 0L
    out(2L).getAs[Long]("keep_flag") shouldBe 0L
    out(2L).getAs[Double]("top_token_ratio") shouldBe 0.5 +- 1e-9
    out(0L).getAs[Long]("n_tokens") shouldBe 40L
  }

  test("stratifiedSample: deterministic across runs, subset of input") {
    val a = Curation.stratifiedSample(docs).as[(Long, String, String)].collect().toSet
    val b = Curation.stratifiedSample(docs).as[(Long, String, String)].collect().toSet
    a shouldBe b
    a.map(_._1).subsetOf(Set(0L, 1L, 2L)) shouldBe true
  }

  test("sampleExactK: heap-agg sample equals the window row_number reference") {
    import org.apache.spark.sql.expressions.Window
    val many = (0L until 200L).map(i => (i, s"text $i", if (i % 3 == 0) "en" else "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val k = 5
    val got = Curation.sampleExactK(many, k)
      .as[(Long, String, Long)].collect().toSet
    val hash = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long")
    val want = many.select($"doc_id", $"lang", hash.as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"h", $"doc_id")))
      .filter($"rn" <= k)
      .select($"doc_id", $"lang", $"rn".cast("long"))
      .as[(Long, String, Long)].collect().toSet
    got shouldBe want
    got.size shouldBe 2 * k
  }

  test("sampleWeighted: heap-agg priorities equal the window reference; length-weighted") {
    import org.apache.spark.sql.expressions.Window
    // doc i has i%37+1 tokens — weights vary 1..37 within each lang
    val many = (0L until 300L).map { i =>
      (i, (0L to i % 37).map(j => s"t$j").mkString(" "),
        if (i % 3 == 0) "en" else "de", "s")
    }.toDF("doc_id", "text", "lang", "source")
    val k = 7
    val got = Curation.sampleWeighted(many, k)
      .as[(Long, String, Double, Long)].collect().toSet
    val hash = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long")
    val pri = org.apache.spark.sql.functions.size(split($"text", " ")).cast("double") /
      (($"h" + lit(1L)).cast("double") / lit(4294967296.0))
    val want = many.select($"doc_id", $"lang", hash.as("h"), $"text")
      .withColumn("pri", pri)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"pri".desc, $"doc_id")))
      .filter($"rn" <= k)
      .select($"doc_id", $"lang", $"pri", $"rn".cast("long"))
      .as[(Long, String, Double, Long)].collect().toSet
    got shouldBe want
    got.size shouldBe 2 * k
    // weighting is real: the sampled docs' mean token count exceeds the
    // corpus mean (long docs get proportionally larger priorities)
    val sampledIds = got.map(_._1)
    val meanW = (id: Set[Long]) => id.toSeq.map(i => (i % 37) + 1.0).sum / id.size
    meanW(sampledIds) should be > meanW((0L until 300L).toSet)
  }

  test("lengthTiers: histogram cutoffs reproduce the ntile-by-value reference") {
    val many = (0L until 500L).map { i =>
      (i, (0L to (i * 13) % 61).map(j => s"t$j").mkString(" "), "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
    val out = Curation.lengthTiers(many, tiers = 4)
      .as[(Long, Long, Long)].collect()
    out.length shouldBe 500
    // reference: lower-quantile rule computed independently
    val lens = out.map(_._2).sorted
    val n = lens.length
    val cuts = (1 until 4).map { t =>
      lens.find(v => lens.count(_ <= v).toLong * 4 >= n.toLong * t).get
    }
    out.foreach { case (_, len, tier) =>
      tier shouldBe 1L + cuts.count(len > _)
    }
    // every tier is populated and ordered by length
    out.map(_._3).distinct.sorted shouldBe Seq(1L, 2L, 3L, 4L)
    val maxPerTier = out.groupBy(_._3).view.mapValues(_.map(_._2).max).toMap
    maxPerTier(1L) should be <= maxPerTier(2L)
    maxPerTier(3L) should be <= maxPerTier(4L)
  }

  test("lengthTiers: empty corpus yields an empty frame, not a crash") {
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    Curation.lengthTiers(empty).count() shouldBe 0L
  }

  test("splitCounts: buckets partition the corpus, counts add up") {
    val many = (0L until 300L).map(i => (i, "t", "en", if (i % 2 == 0) "web" else "book"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Curation.splitCounts(many).as[(String, String, Long)].collect()
    out.map(_._3).sum shouldBe 300L
    // deterministic: same assignment on re-run
    Curation.splitCounts(many).as[(String, String, Long)].collect()
      .toSet shouldBe out.toSet
  }

  test("redactPii: counts and scrubs emails, IPv4s, phone runs") {
    val pii = Seq(
      (0L, "mail a@b.com and c.d+x@e.org here", "en", "s"),
      (1L, "server at 10.0.0.1 and 192.168.1.255 up", "en", "s"),
      (2L, "call +1 555 123 4567 now", "en", "s"),
      (3L, "clean text with no identifiers at all", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Curation.redactPii(pii).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(0L).getAs[Long]("n_emails") shouldBe 2L
    out(1L).getAs[Long]("n_ips") shouldBe 2L
    out(2L).getAs[Long]("n_phones") shouldBe 1L
    out(3L).getAs[Long]("n_emails") shouldBe 0L
    out(3L).getAs[Long]("n_ips") shouldBe 0L
    out(3L).getAs[Long]("n_phones") shouldBe 0L
    // "call <PII> now" after the phone is scrubbed
    out(2L).getAs[Long]("clean_len") shouldBe "call <PII> now".length.toLong
    out(3L).getAs[Long]("clean_len") shouldBe 37L
  }

  test("budgetPack: per-lang cumsum never exceeds budget, best-quality-first") {
    val out = Curation.budgetPack(docs, budget = 45L).collect()
    out.foreach(r => r.getAs[Long]("cum_tokens") should be <= 45L)
    // en: doc 0 (40 tokens, higher quality) admitted first; doc 1 would
    // push the en total to 50 > 45, so only one en row survives
    out.count(_.getAs[String]("lang") == "en") shouldBe 1
    out.find(_.getAs[String]("lang") == "en").get.getAs[Long]("doc_id") shouldBe 0L
  }

  test("gopherRules one-pass projection ≡ the explode + two-level-agg formulation") {
    // degenerate shapes: repeated token, unicode chars, single token, long doc
    val tricky = Seq(
      (10L, "a a a a b", "en", "s"),
      (11L, "héllo wörld héllo", "de", "s"),
      (12L, "x", "en", "s"),
      (13L, (1 to 200).map(i => s"tok${i % 17}").mkString(" "), "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val all = docs.unionByName(tricky)
    val got = Curation.gopherRules(all)
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSet
    val ref = Curation.gopherRulesViaAgg(all)
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSet
    got shouldBe ref
    // and the fast path's plan is shuffle-free past fanOut: no aggregate
    val plan = Curation.gopherRules(all).queryExecution.optimizedPlan
    plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    } shouldBe empty
  }

  test("packSequences ≡ per-lang window cumsum; deterministic; window-free plan") {
    import org.apache.spark.sql.expressions.Window
    // multi-lang, enough rows to span several range partitions
    val many = (0L until 500L).map { i =>
      val lang = if (i % 7 == 0) "de" else if (i % 11 == 0) "fr" else "en"
      (i, (1 to (3 + (i % 29)).toInt).map(j => s"t$j").mkString(" "), lang, "s")
    }.toDF("doc_id", "text", "lang", "source")
    val seqLen = 64L
    val got = Curation.packSequences(many, seqLen)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = many.select($"doc_id", $"lang",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split($"text", " "))
          .cast("long").as("n_tokens"))
      .withColumn("before", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .select($"doc_id", $"lang", $"n_tokens",
        ($"before" / seqLen).cast("long").as("seq_id"),
        ($"before" % seqLen).as("seq_offset"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    got shouldBe want
    // deterministic across runs (range boundaries re-sampled each run)
    Curation.packSequences(many, seqLen)
      .as[(Long, String, Long, Long, Long)].collect().toSet shouldBe got
    // the scan is window-free: no logical Window node anywhere in its plan
    val lp = Curation.packSequences(many, seqLen).queryExecution.optimizedPlan
    lp.collect {
      case win: org.apache.spark.sql.catalyst.plans.logical.Window => win
    } shouldBe empty
  }

  test("budgetPack two-phase ≡ the single per-lang window formulation; no full-stratum doc window") {
    import org.apache.spark.sql.expressions.Window
    // skewed corpus: 90% en (the scale hazard), token counts and quality
    // scores varied so the budget boundary lands inside a score group
    val many = (0L until 400L).map { i =>
      val lang = if (i % 10 == 0) "de" else "en"
      val words = 5 + (i % 37).toInt
      (i, (1 to words).map(j => s"w${(i * 7 + j) % 53}").mkString(" "), lang, "s")
    }.toDF("doc_id", "text", "lang", "source")
    val budget = 600L
    val got = Curation.budgetPack(many, budget)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    // reference: the round-4 single-window formulation
    val q = graft.ext.TextAnalysis.qualityScore(many)
      .join(many.select($"doc_id", $"lang"), Seq("doc_id"))
    val w = Window.partitionBy($"lang")
      .orderBy($"quality_score".desc, $"doc_id".asc)
    val want = q.withColumn("cum_tokens", sum($"n_tokens").over(w))
      .filter($"cum_tokens" <= budget)
      .select($"doc_id", $"lang", $"n_tokens", $"quality_score", $"cum_tokens")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    got shouldBe want
    // plan shape: no window over doc rows partitioned by lang alone — the
    // only per-lang window runs over the (lang, score) histogram aggregate;
    // the doc-level window partitions by (lang, quality_score)
    val lp = Curation.budgetPack(many, budget).queryExecution.optimizedPlan
    val wins = lp.collect {
      case win: org.apache.spark.sql.catalyst.plans.logical.Window => win }
    wins should not be empty
    wins.foreach { win =>
      if (win.partitionSpec.size == 1) {
        assert(win.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.isDefined, s"per-lang window over raw doc rows:\n$win")
      } else {
        win.partitionSpec.size shouldBe 2
      }
    }
  }

  test("mixTemperature: sqrt weights upweight the small source") {
    // tokens: s0 = 100, s1 = 400 → w = 10, 20 → p = 1/3, 2/3; under
    // proportional mixing s0 would get 0.2 — temperature lifts it to 0.333
    val corpus = (
      (0 until 10).map(i => (i.toLong, (1 to 10).map(j => s"a$j").mkString(" "), "en", "s0")) ++
      (10 until 50).map(i => (i.toLong, (1 to 10).map(j => s"b$j").mkString(" "), "en", "s1"))
    ).toDF("doc_id", "text", "lang", "source")
    val out = Curation.mixTemperature(corpus, budget = 900000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    out("s0") shouldBe ((10L, 100L, 0.333333, 299999L))
    out("s1") shouldBe ((40L, 400L, 0.666667, 600000L))
  }

  test("splitLeakage: a duplicated prefix spread across splits is flagged, " +
    "unique docs are not") {
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ")
    val corpus = (
      // 200 docs with the SAME 8-token prefix: hash buckets of ids 0..199
      // scatter across the 90/5/5 splits
      (0 until 200).map(i => (i.toLong, s"$shared tail$i", "en", "s0")) ++
      // unique docs: never flagged
      (200 until 210).map(i => (i.toLong, (1 to 8).map(j => s"u${i}_$j").mkString(" "), "en", "s0"))
    ).toDF("doc_id", "text", "lang", "source")
    val rows = Curation.splitLeakage(corpus).collect()
    rows.length shouldBe 1
    rows.head.getAs[Long]("n_docs") shouldBe 200L
    rows.head.getAs[Long]("n_splits") should be >= 2L
  }

  test("domainCap: at most cap docs per source, deterministic, mega-domain capped") {
    val corpus = (
      (0 until 100).map(i => (i.toLong, s"doc $i", "en", "mega")) ++
      (100 until 105).map(i => (i.toLong, s"doc $i", "en", "tiny"))
    ).toDF("doc_id", "text", "lang", "source")
    val out = Curation.domainCap(corpus, cap = 7).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource("mega").length shouldBe 7
    bySource("tiny").length shouldBe 5 // under the cap: all survive
    out.map(_.getAs[Long]("rn")).max shouldBe 7L
    // deterministic: a re-run picks the identical doc ids
    val again = Curation.domainCap(corpus, cap = 7).collect()
      .map(_.getAs[Long]("doc_id")).sorted
    again shouldBe out.map(_.getAs[Long]("doc_id")).sorted
  }

  test("globalShuffle: (shard, pos) is a total order — a permutation of the corpus") {
    val corpus = (0 until 300)
      .map(i => (i.toLong, s"doc $i", "en", "s0")).toDF("doc_id", "text", "lang", "source")
    val out = Curation.globalShuffle(corpus, shards = 8).collect()
    out.length shouldBe 300
    // every doc exactly once
    out.map(_.getAs[Long]("doc_id")).sorted shouldBe (0L until 300L).toArray
    // within each shard, pos is contiguous 1..n_shard (no gaps, no dupes)
    out.groupBy(_.getAs[Long]("shard")).values.foreach { rows =>
      rows.map(_.getAs[Long]("pos")).sorted shouldBe (1L to rows.length).toArray
    }
    // and the composite key is unique
    out.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).distinct
      .length shouldBe 300
  }

  test("shardStats: per-shard loads cover the corpus and balance within bound") {
    val corpus = (0 until 400)
      .map(i => (i.toLong, "x", "en", "s0", 100L + i % 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.shardStats(corpus, shards = 8).collect()
    out.map(_.getAs[Long]("n_docs")).sum shouldBe 400L
    out.map(_.getAs[Long]("n_chars")).sum shouldBe
      (0 until 400).map(i => 100L + i % 7).sum
    // md5 sharding at 50 docs/shard: no shard should be pathological
    out.map(_.getAs[Long]("n_docs")).max should be < 100L
  }

  test("semanticContamination: planted leak flagged, broadcast-NLJ plan") {
    // md5(doc_id-string) % 100 buckets: 8 -> 93 (holdout), others train
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), // train, equals eval 8 -> cosine 1.0
      (1L, Array(0.0f, 1.0f, 0.0f)), // train, orthogonal to 8
      (8L, Array(1.0f, 0.0f, 0.0f)) // holdout
    ).toDF("vec_id", "embedding")
    val out = Curation.semanticContamination(e, threshold = 0.5)
    val rows = out.collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) shouldBe
      Array((0L, 8L, 1.0))
    // the NLJ over the broadcast holdout side IS the intended plan: the
    // corpus side must never shuffle
    val plan = out.queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
  }
}
