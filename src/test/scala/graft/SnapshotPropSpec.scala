package graft

import graft.ext.Snapshot
import org.scalacheck.{Gen, Prop}
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
    val prop = Prop.forAllNoShrink(genSnap, genSnap) { (o, n) =>
      val odf = o.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "v1", "v2")
      val ndf = n.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "v1", "v2")
      val got = Snapshot.diff(odf, ndf, "k", Seq("v1", "v2"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == classify(o, n)
    }
    PropCheck.check(prop, minSuccessful = 40, tag = "SnapshotPropSpec#1")
  }

  test("scd2 ≡ per-key reference history over random snapshot pairs") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(genSnap, genSnap) { (o, n) =>
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
    PropCheck.check(prop, minSuccessful = 40, tag = "SnapshotPropSpec#2")
  }

  test("applyChangelog: latest seq wins per key — D drops, I/U upsert, " +
    "untouched base keys pass through") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v")
    val log = Seq(
      (2L, 1L, "U", "b2"), (2L, 5L, "D", null), // delete wins at seq 5
      (3L, 1L, "D", null), (3L, 2L, "U", "c2"), // update wins at seq 2
      (4L, 1L, "I", "d"), // insert of an absent key
      (5L, 1L, "D", null) // delete of an absent key: no row
    ).toDF("k", "seq", "op", "v")
    val got = Snapshot.applyChangelog(base, log, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 3L -> "c2", 4L -> "d"))
  }

  test("applyChangelog inverts diff: applying the changelog derived from " +
    "diff(old, new) to old reproduces new exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val prop = Prop.forAllNoShrink(genSnap, genSnap) { (o, n) =>
      val odf = o.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "v1", "v2")
      val ndf = n.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "v1", "v2")
      val d = Snapshot.diff(odf, ndf, "k", Seq("v1", "v2"))
      // changelog from the classification: I/U carry the NEW row, D nulls
      val log = d.filter(col("change_type") =!= "unchanged")
        .join(ndf, Seq("k"), "left")
        .select(col("k"), lit(1L).as("seq"),
          when(col("change_type") === "insert", "I")
            .when(col("change_type") === "update", "U")
            .otherwise("D").as("op"),
          col("v1"), col("v2"))
      val got = Snapshot.applyChangelog(odf, log, "k", Seq("v1", "v2"))
        .collect()
        .map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.getString(2)))))
        .toMap
      got == n
    }
    PropCheck.check(prop, minSuccessful = 40, tag = "SnapshotPropSpec#3")
  }
}
