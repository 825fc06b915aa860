package graft

import graft.ext.{Bloom, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bloom membership contract vs the exact anti-join twin: NO false
  * negatives ever (every fingerprint actually in the base must test
  * maybe_in_base), and a false-positive rate within the classic
  * (1 - e^(-kn/m))^k sizing bound at the fixture's base cardinality. */
class BloomSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("no false negatives: every exact in-base verdict is maybe_in_base") {
    val base = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 =!= 0)
    val bloom = Bloom.bloomIncremental(base, batch)
      .select("doc_id", "maybe_in_base").as[(Long, Boolean)].collect().toMap
    val exact = Dedup.incrementalDedup(base, batch)
      .select("doc_id", "dup_of_base").as[(Long, Boolean)].collect().toMap
    exact.keySet shouldBe bloom.keySet
    // superset: exact in-base ⇒ bloom maybe_in_base; the converse may
    // fail at the FP rate (that's the trade)
    exact.filter(_._2).keys.foreach { id => bloom(id) shouldBe true }
  }

  test("false-positive rate within the sizing bound") {
    val base = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 =!= 0)
    val m = 1 << 16
    val k = 5
    val bloom = Bloom.bloomIncremental(base, batch, mBits = m, kHashes = k)
      .select("doc_id", "maybe_in_base").as[(Long, Boolean)].collect().toMap
    val exact = Dedup.incrementalDedup(base, batch)
      .select("doc_id", "dup_of_base").as[(Long, Boolean)].collect().toMap
    val trueNeg = exact.filterNot(_._2).keys.toSeq
    val fps = trueNeg.count(bloom(_))
    val n = base.select(graft.ext.TextAnalysis.prefixFingerprint(col("text")))
      .distinct().count()
    // p = (1 - e^(-kn/m))^k, with slack 3 + 2 absolute for tiny samples
    val p = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    fps.toDouble should be <= (3 * p * trueNeg.size + 2)
  }

  test("memberExpr is a pure projection: no join or aggregate in the " +
    "probe-side plan") {
    val base = docs.filter(col("doc_id") % 2 === 0)
    val fp = graft.ext.TextAnalysis.prefixFingerprint(col("text"))
    val bits = Bloom.buildBits(base, fp)
    val probe = docs.select(col("doc_id"),
      Bloom.memberExpr(fp, bits, 1 << 16).as("hit"))
    probe.count()
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Aggregate"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("build side: one single-row aggregation whose exchange carries " +
    "bitset partials, not fingerprints") {
    val base = docs.filter(col("doc_id") % 2 === 0)
    val fp = graft.ext.TextAnalysis.prefixFingerprint(col("text"))
    val bits = Bloom.buildBits(base, fp, mBits = 1 << 16, kHashes = 5)
    bits.length shouldBe (1 << 16) / 64
    bits.map(java.lang.Long.bitCount).sum should be > 0
    // deterministic: same base → identical words
    Bloom.buildBits(base, fp, mBits = 1 << 16, kHashes = 5) shouldBe bits
  }
}
