package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (same quirk-relevant config as
  * Verify/Bench: non-ANSI casts, LAST_WIN map concat, UTC). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** A session with its OWN SQLConf (same SparkContext, shared state, and
    * extensions). Suites that mutate plan-affecting session confs — AQE
    * skew thresholds, broadcast-join disables, the state-store provider —
    * MUST run on one of these: the 115 suites execute in parallel against
    * [[spark]], and a conf flip on the shared session mid-flight is
    * visible to every concurrently-running query (the one-in-N flake the
    * r16 audit caught). Builder-time confs (shuffle partitions, UTC,
    * non-ANSI, LAST_WIN) live in the SparkContext conf, so the clone
    * inherits them. */
  def isolated(): SparkSession = spark.newSession()
}
