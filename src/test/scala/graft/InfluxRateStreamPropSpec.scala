package graft

import graft.sources.{InfluxReadTransports, InfluxRollupRead}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for the STREAMING counter-rate read: over random
  * reset-bearing counter walks, shard counts and RANDOM trigger splits,
  * the maintained per-(series, bucket) increase must equal the batch
  * rateRead over the same samples at 1e-9 relative (the segment fold
  * adds the same deltas in a different association). The trigger split
  * is the property's point: cross-trigger stitch state must replay the
  * batch lag chain no matter where the boundaries fall. */
class InfluxRateStreamPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = 1704067200000L
  private val hour = 3600000L
  private val span = 3 * hour

  import InfluxCsvFixture.{S, csvOf}

  // counter walks: per entity, strictly increasing times on a coarse
  // grid (unique (entity, ms) so the lag chain is a total order), values
  // mixing increments and resets; occasional string samples (None) that
  // the rate must skip
  private val samplesGen: Gen[List[S]] = for {
    n <- Gen.chooseNum(0, 24)
    raw <- Gen.listOfN(n, for {
      ent <- Gen.oneOf("a", "b")
      slot <- Gen.chooseNum(0L, 35L)
      v <- Gen.frequency(
        5 -> Gen.chooseNum(0, 400).map(x => Some(x / 4.0)),
        1 -> Gen.const(None))
    } yield S(Some(ent), t0 + slot * 300000L, v))
  } yield raw.groupBy(s => (s.entity, s.ms)).map(_._2.head).toList

  // 1–3 interior trigger boundaries inside the span (plus the final one)
  private val cutsGen: Gen[List[Long]] = for {
    k <- Gen.chooseNum(1, 3)
    cs <- Gen.listOfN(k, Gen.chooseNum(1L, span - 1))
  } yield (cs.map(t0 + _) :+ (t0 + span)).distinct.sorted

  private def close(a: Map[(String, Long), Double],
                    b: Map[(String, Long), Double]): Boolean =
    a.keySet == b.keySet && a.forall { case (k, v) =>
      math.abs(v - b(k)) <= 1e-9 * math.max(1.0, math.abs(b(k)))
    }

  private def run(samples: Seq[S], cuts: Seq[Long], parts: Int): Boolean = {
    InfluxReadTransports.testOverride = Some(_ => csvOf(samples))
    @volatile var now = cuts.head
    InfluxReadTransports.clockOverride = Some(() => now)
    try {
      val opts = InfluxRollupRead.rateOptions(hour, Map(
        "bucket" -> "bkt", "readPartitions" -> parts.toString,
        "rollup.group" -> "tag:entity_id",
        "rollup.measurement" -> "ha_states",
        "rollup.startMs" -> t0.toString,
        "rollup.stopMs" -> (t0 + span).toString))
      val spec = InfluxRollupRead.fromOptions(
        scala.jdk.CollectionConverters.MapHasAsJava(opts).asJava).get
      val partials = opts.foldLeft(spark.readStream.format("influx")) {
        case (r, (k, v)) => r.option(k, v)
      }.load()
      val name = s"sv_rate_prop_${System.nanoTime()}"
      val q = graft.streaming.StreamingEvents.influxRateStream(partials, spec)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        cuts.foreach { c => now = c; q.processAllAvailable() }
      } finally q.stop()
      val streamed = spark.table(name)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(4)))
        .groupBy(r => (r._1, r._2)).map { case (k, rs) =>
          k -> rs.maxBy(_._4)._3
        }
      val batch = InfluxRollupRead.rateRead(spark, opts)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      spark.sql(s"DROP TABLE IF EXISTS $name")
      close(streamed.toMap, batch)
    } finally {
      InfluxReadTransports.testOverride = None
      InfluxReadTransports.clockOverride = None
    }
  }

  test("maintained stitched rate ≡ batch rateRead for random walks, " +
    "shards and trigger splits (property)") {
    val gen = for {
      ss <- samplesGen
      cuts <- cutsGen
      parts <- Gen.chooseNum(1, 2)
    } yield (ss, cuts, parts)
    val prop = Prop.forAll(gen) { case (ss, cuts, parts) =>
      run(ss, cuts, parts)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
