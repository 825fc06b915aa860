package graft

import graft.ext.Snapshot
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SnapshotSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val old = Seq(
    (1L, Option("a"), Option("x")), // unchanged
    (2L, Option("b"), Option("y")), // updated in new
    (3L, Option("c"), Option("z")), // deleted
    (5L, Option.empty[String], Option("x")) // null-swap trap vs new
  ).toDF("k", "v1", "v2")

  private val nw = Seq(
    (1L, Option("a"), Option("x")),
    (2L, Option("B"), Option("y")),
    (4L, Option("d"), Option("w")), // inserted
    (5L, Option("x"), Option.empty[String])
  ).toDF("k", "v1", "v2")

  test("diff: all four change classes, by key") {
    val out = Snapshot.diff(old, nw, "k", Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "unchanged", 2L -> "update", 3L -> "delete",
      4L -> "insert", 5L -> "update")
  }

  test("diff: (null, x) vs (x, null) is an update, not unchanged") {
    // Spark's hash skips null inputs, so without the interleaved null
    // flags these two rows would collide — key 5 is exactly that trap
    val out = Snapshot.diff(old, nw, "k", Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(5L) shouldBe "update"
  }

  test("scd2: update emits closed+current, delete closes, insert opens") {
    val rows = Snapshot.scd2(old, nw, "k", Seq("v1", "v2"), 10L, 20L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
      .groupBy(_._1)
    rows(1L).toSet shouldBe Set((1L, "a", 10L, -1L, true))
    rows(2L).toSet shouldBe Set(
      (2L, "b", 10L, 20L, false), (2L, "B", 20L, -1L, true))
    rows(3L).toSet shouldBe Set((3L, "c", 10L, 20L, false))
    rows(4L).toSet shouldBe Set((4L, "d", 20L, -1L, true))
  }
}
