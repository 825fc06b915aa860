package graft

import java.sql.DriverManager

import graft.etl.Sources
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** S1 (real SQLite path): `Sources.sqliteJdbc` against an actual `.db`
  * file. The sandbox ships no SQLite driver and the build resolves
  * offline, so this spec probes the classpath for Xerial's
  * `org.sqlite.JDBC` and CANCELS cleanly when it is absent (the
  * embedded-Derby trio in `JdbcSourceSpec` + the oracle-gated
  * `core_pipeline_jdbc` cover the shared partitioned-read plumbing). In
  * a real deployment, drop `sqlite-jdbc-<v>.jar` into `lib/` (sbt's
  * default unmanaged classpath — no build change needed) and this spec
  * generates a recorder-shaped database with SQLite's own driver, reads
  * it back through the exact `sqliteJdbc` entry point
  * (`etl/Tables.scala`) as disjoint range-partitioned queries, and
  * checks coverage, disjointness and value fidelity. */
class SqliteSourceSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val driverPresent =
    try { Class.forName("org.sqlite.JDBC"); true }
    catch { case _: ClassNotFoundException => false }

  private def withDb[T](body: String => T): T = {
    val f = java.nio.file.Files.createTempFile("graft_sqlite", ".db")
    java.nio.file.Files.delete(f)
    try body(f.toAbsolutePath.toString)
    finally java.nio.file.Files.deleteIfExists(f)
  }

  test("real SQLite roundtrip: a generated recorder .db reads back " +
    "range-partitioned through sqliteJdbc, every row exactly once " +
    "(cancels when the Xerial jar is absent)") {
    assume(driverPresent,
      "org.sqlite.JDBC not on the classpath — drop sqlite-jdbc into lib/ " +
        "to exercise the real-database path")
    withDb { path =>
      val conn = DriverManager.getConnection(s"jdbc:sqlite:$path")
      try {
        val st = conn.createStatement()
        st.executeUpdate(
          """CREATE TABLE states (
            |  state_id INTEGER PRIMARY KEY,
            |  entity_id TEXT,
            |  state TEXT,
            |  last_updated_ts REAL
            |)""".stripMargin)
        val ins = conn.prepareStatement(
          "INSERT INTO states VALUES (?, ?, ?, ?)")
        (0 until 120).foreach { i =>
          ins.setInt(1, i)
          ins.setString(2, s"sensor.temp_${i % 7}")
          ins.setString(3, (15.0 + i % 10).toString)
          ins.setDouble(4, 1.7e9 + i * 60.0)
          ins.executeUpdate()
        }
        ins.close(); st.close()
      } finally conn.close()
      val df = Sources.sqliteJdbc(spark, path, "states",
        partitionColumn = Some("last_updated_ts"),
        lowerBound = Some(1.7e9),
        upperBound = Some(1.7e9 + 120 * 60.0),
        numPartitions = 4)
      df.rdd.getNumPartitions shouldBe 4
      df.count() shouldBe 120
      df.select("state_id").distinct().count() shouldBe 120
      val perPart = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
      all(perPart) should be > 0
      // value fidelity through SQLite's dynamic typing: REAL epoch
      // seconds and TEXT states survive the driver round-trip
      val row = df.filter(org.apache.spark.sql.functions
        .col("state_id") === 7).collect().head
      row.getAs[String]("entity_id") shouldBe "sensor.temp_0"
      row.getAs[Double]("last_updated_ts") shouldBe (1.7e9 + 420.0)
    }
  }

  test("single-partition sqliteJdbc scan returns the same rows serially " +
    "(cancels when the Xerial jar is absent)") {
    assume(driverPresent,
      "org.sqlite.JDBC not on the classpath — drop sqlite-jdbc into lib/ " +
        "to exercise the real-database path")
    withDb { path =>
      val conn = DriverManager.getConnection(s"jdbc:sqlite:$path")
      try {
        val st = conn.createStatement()
        st.executeUpdate(
          "CREATE TABLE states (state_id INTEGER, state TEXT)")
        st.executeUpdate("INSERT INTO states VALUES (1, 'on'), (2, 'off')")
        st.close()
      } finally conn.close()
      val df = Sources.sqliteJdbc(spark, path, "states")
      df.rdd.getNumPartitions shouldBe 1
      df.count() shouldBe 2
    }
  }
}
