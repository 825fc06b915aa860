package graft

import graft.ext.Snapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** A commit-ordered changelog applied per micro-batch (foreachBatch
  * MERGE against a maintained snapshot — the Delta/Hudi streaming-merge
  * shape) must end at exactly the one-shot batch MERGE of the whole log.
  * Holds because every entry's effect is absorbing (D → absent, I/U →
  * its values, independent of prior state), so a key's entries applied
  * sequentially in increasing seq order land on the max-seq entry —
  * precisely what the single batch MERGE picks. */
class CdcUpsertStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("foreachBatch-merged snapshot ≡ batch applyChangelog, entries " +
    "crossing micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // commit-ordered log: per key at most one entry per seq; the
    // interesting keys change ACROSS the batch split below
    val log = Seq(
      (4L, 1L, "I", "d"), // insert (batch 1)
      (2L, 1L, "U", "b1"), // update... (batch 1)
      (3L, 1L, "D", null), // delete (batch 1)
      (2L, 2L, "D", null), // ...then delete across the boundary (batch 2)
      (3L, 2L, "I", "c2"), // delete-then-reinsert across the boundary
      (4L, 2L, "U", "d2") // insert-then-update across the boundary
    )
    val source = MemoryStream[(Long, Long, String, String)]
    var snapshot = base.localCheckpoint()
    val q = source.toDF().toDF("k", "seq", "op", "v")
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        snapshot = Snapshot.applyChangelog(snapshot, batch, "k", Seq("v"))
          .localCheckpoint()
        ()
      }.start()
    try {
      Seq(log.take(3), log.drop(3)).foreach { c =>
        source.addData(c.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = snapshot.as[(Long, String)].collect().toMap
    val direct = Snapshot.applyChangelog(base, log.toDF("k", "seq", "op", "v"),
      "k", Seq("v")).as[(Long, String)].collect().toMap
    streamed shouldBe direct
    streamed shouldBe Map(1L -> "a", 3L -> "c2", 4L -> "d2")
  }
}
