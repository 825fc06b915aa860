package graft

import graft.ext.EventsExt
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property: the endpoint-differencing identity behind the
  * energy-dashboard read. `energyRange` computes per-series consumption
  * as cumulative-sum differences at the range endpoints; the sequential
  * model computes it as the SUM of reset-aware deltas whose (later-
  * sample) bucket lands in [startMs, endMs) — the two must agree exactly
  * (both are the one-cast double of the same exact DECIMAL), on random
  * reset-bearing, null-bearing streams and random UNALIGNED endpoints
  * (the range compares bucket START times, HA's row-key convention). */
class EnergyRangePropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = 1704067200000L
  private val hour = 3600000L

  private val genCase: Gen[(List[(Long, Long, Long, Option[Double])], Long, Long)] =
    for {
      n <- Gen.chooseNum(0, 40)
      rows <- Gen.listOfN(n, for {
        user <- Gen.chooseNum(1L, 3L)
        ms <- Gen.chooseNum(0L, 83L).map(t0 + _ * 300000L)
        v <- Gen.frequency(
          8 -> Gen.chooseNum(0, 400).map(x => Option(x / 4.0)),
          1 -> Gen.const(Option.empty[Double]))
      } yield (user, ms, v))
      // raw-ms endpoints, deliberately NOT bucket-aligned
      a <- Gen.chooseNum(0L, 7L * hour)
      b <- Gen.chooseNum(0L, 7L * hour)
      if a != b
    } yield (rows.zipWithIndex.map { case ((u, ms, v), i) =>
      (i.toLong + 1, u, ms, v)
    }, t0 + math.min(a, b), t0 + math.max(a, b))

  /** Sequential model in exact quarter-integer arithmetic: per-ms max
    * dedup, reset-aware deltas to the LATER sample's bucket, sum the
    * deltas of in-range buckets (bucket start in [startMs, endMs)). */
  private def model(rows: Seq[(Long, Long, Long, Option[Double])],
                    startMs: Long, endMs: Long): Map[Long, (Double, Long)] =
    rows.collect { case (_, u, ms, Some(v)) => (u, ms, (v * 4).toLong) }
      .groupBy(_._1).flatMap { case (u, rs) =>
        val deduped = rs.groupBy(_._2).map { case (ms, xs) =>
          (ms, xs.map(_._3).max)
        }.toSeq.sortBy(_._1)
        val buckets = scala.collection.mutable.Map.empty[Long, Long]
        var prev = Option.empty[Long]
        deduped.foreach { case (ms, q) =>
          val b = ms - ms % hour
          val d = prev.fold(0L)(p => if (q >= p) q - p else q)
          buckets(b) = buckets.getOrElse(b, 0L) + d
          prev = Some(q)
        }
        val visible = buckets.filter(_._1 < endMs)
        // toSeq before mapping to values: Map.keys is a SET, and mapping
        // a Set to bucket values collapses equal-valued buckets before
        // the sum — the model bug behind the r16 one-in-N suite flake
        // (the product code was right; two in-range buckets with equal
        // deltas made the model undercount)
        val inRange = visible.keys.toSeq.filter(_ >= startMs)
        if (inRange.isEmpty) None
        else Some(u -> ((inRange.map(visible).sum / 4.0, inRange.size.toLong)))
      }

  test("energyRange ≡ the sequential in-range delta-sum model on random " +
    "reset/null-bearing streams and unaligned endpoints (property)") {
    // NoShrink: shrinking leaves the generator's domain (quarter-unit
    // values, 5-min grid, t0-anchored endpoints) and the exact-arithmetic
    // model is only defined ON that domain — a shrunk "counterexample"
    // would be an artifact. The pinned PropCheck seed already makes the
    // original case reproducible verbatim.
    val prop = Prop.forAllNoShrink(genCase) { case (rows, startMs, endMs) =>
      import spark.implicits._
      val got: Map[Long, (Double, Long)] =
        if (rows.isEmpty) Map.empty
        else EventsExt.energyRange(
            rows.toDF("event_id", "user_id", "ms", "value")
              .selectExpr("event_id", "user_id", "value",
                "timestamp_millis(ms) AS ts"),
            startMs, endMs)
          .collect().map(r => r.getAs[Long]("user_id") ->
            ((r.getAs[Double]("energy"), r.getAs[Long]("n_buckets")))).toMap
      val want = model(rows, startMs, endMs)
      val msg =
        s"energyRange mismatch [$startMs, $endMs)\n  got= ${got.toSeq.sortBy(_._1)}" +
          s"\n  want=${want.toSeq.sortBy(_._1)}"
      Prop.propBoolean(got == want) :| msg
    }
    PropCheck.check(prop, minSuccessful = 15, tag = "EnergyRangePropSpec#1")
  }
}
