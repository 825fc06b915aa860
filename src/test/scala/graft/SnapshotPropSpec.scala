package graft

import graft.ext.Snapshot
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for the CDC pair: diff's classification and scd2's
  * emitted history rows must match a direct per-key reference over random
  * snapshot pairs (small key space + small value alphabet → all four
  * change classes and null values occur constantly). */
class SnapshotPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val genSnap: Gen[Map[Long, (Option[String], Option[String])]] =
    Gen.mapOf(for {
      k <- Gen.chooseNum(0L, 12L)
      a <- Gen.option(Gen.oneOf("x", "y"))
      b <- Gen.option(Gen.oneOf("x", "y"))
    } yield k -> ((a, b)))

  private def classify(o: Map[Long, (Option[String], Option[String])],
                       n: Map[Long, (Option[String], Option[String])])
    : Map[Long, String] =
    (o.keySet ++ n.keySet).map { k =>
      k -> ((o.get(k), n.get(k)) match {
        case (None, Some(_)) => "insert"
        case (Some(_), None) => "delete"
        case (Some(a), Some(b)) if a != b => "update"
        case _ => "unchanged"
      })
    }.toMap

  test("diff ≡ per-key reference over random snapshot pairs") {
    import spark.implicits._
    val prop = Prop.forAll(genSnap, genSnap) { (o, n) =>
      val odf = o.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "v1", "v2")
      val ndf = n.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "v1", "v2")
      val got = Snapshot.diff(odf, ndf, "k", Seq("v1", "v2"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == classify(o, n)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("scd2 ≡ per-key reference history over random snapshot pairs") {
    import spark.implicits._
    val prop = Prop.forAll(genSnap, genSnap) { (o, n) =>
      val odf = o.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "v1", "v2")
      val ndf = n.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "v1", "v2")
      val got = Snapshot.scd2(odf, ndf, "k", Seq("v1", "v2"), 10L, 20L)
        .collect().map { r =>
          (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)),
            r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
            r.getBoolean(5))
        }.toSet
      val want = classify(o, n).flatMap { case (k, cls) =>
        val ov = o.get(k); val nv = n.get(k)
        cls match {
          case "unchanged" => Seq((k, ov.get._1, ov.get._2, 10L, None, true))
          case "insert" => Seq((k, nv.get._1, nv.get._2, 20L, None, true))
          case "delete" => Seq((k, ov.get._1, ov.get._2, 10L, Some(20L), false))
          case "update" => Seq(
            (k, ov.get._1, ov.get._2, 10L, Some(20L), false),
            (k, nv.get._1, nv.get._2, 20L, None, true))
        }
      }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
