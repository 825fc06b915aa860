package graft

import graft.ext.{Curation, QualityModel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The LR distillation trainer: distributed full-batch GD must match a
  * sequential fold of the identical update rule (gradient partials merge
  * associatively; only double addition order differs → tolerance, not
  * bit-equality — which is exactly why the query registration is
  * rows-only), and it must actually LEARN the rule cascade it distills. */
class LrQualitySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 30 docs that pass every Gopher rule (≥30 varied words) and 30 that
  // fail (10 words) — and the vocabularies differ, so hashed features
  // carry the signal
  private def corpus = (
    (0 until 30).map(i =>
      (i.toLong, (1 to 35).map(j => s"good${(i + j) % 50}").mkString(" "), "en", "s0")) ++
    (30 until 60).map(i =>
      (i.toLong, (1 to 10).map(j => s"bad${(i + j) % 20}").mkString(" "), "en", "s0"))
  ).toDF("doc_id", "text", "lang", "source")

  test("distributed GD ≡ the sequential reference fold (same rule, same rounds)") {
    val docs = corpus
    val d = QualityModel.Dim
    val rounds = 12
    val lr = 0.5
    val got = QualityModel.train(docs, d, rounds, lr).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap

    // sequential reference over the SAME feature vectors (collected once;
    // reimplementing the hash would test the hash, not the trainer)
    val labels = Curation.gopherRules(docs)
      .select(col("doc_id"), col("keep_flag").cast("double").as("y"))
    val xy = QualityModel.features(docs, d).join(labels, Seq("doc_id"))
      .select(col("x"), col("y")).as[(Seq[Double], Double)].collect()
    var w = Array.fill(d)(0.0)
    for (_ <- 0 until rounds) {
      val grad = Array.fill(d)(0.0)
      xy.foreach { case (x, y) =>
        val dot = x.indices.map(i => x(i) * w(i)).sum
        val err = 1.0 / (1.0 + math.exp(-dot)) - y
        x.indices.foreach(i => grad(i) += err * x(i))
      }
      val n = xy.length.toDouble
      w = w.indices.map(i => w(i) - lr * grad(i) / n).toArray
    }
    (0 until d).foreach { j =>
      got(j) shouldBe w(j) +- (1e-9 * math.max(1.0, math.abs(w(j))))
    }
  }

  test("the distilled model reproduces the rule verdicts it trained on") {
    val docs = corpus
    val w = QualityModel.train(docs).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    val labels = Curation.gopherRules(docs)
      .select(col("doc_id"), col("keep_flag").cast("double").as("y"))
    val xy = QualityModel.features(docs, QualityModel.Dim)
      .join(labels, Seq("doc_id"))
      .select(col("x"), col("y")).as[(Seq[Double], Double)].collect()
    val acc = xy.count { case (x, y) =>
      val dot = x.indices.map(i => x(i) * w(i)).sum
      (if (dot > 0) 1.0 else 0.0) == y
    }.toDouble / xy.length
    acc should be >= 0.9 // majority baseline is 0.5
  }

  test("codegen lr_logit projection ≡ the explode + groupBy formulation") {
    val a = QualityModel.score(corpus).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val b = QualityModel.scoreViaAgg(corpus).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    a shouldBe b
  }

  test("score: pred is the sign of the exact milli-logit") {
    val out = QualityModel.score(corpus).collect()
    out.length shouldBe 60
    out.foreach { r =>
      val logit = r.getDouble(r.fieldIndex("logit"))
      val pred = r.getLong(r.fieldIndex("pred"))
      pred shouldBe (if (logit > 0) 1L else 0L)
    }
  }
}
