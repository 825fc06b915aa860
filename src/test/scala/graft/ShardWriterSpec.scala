package graft

import graft.ext.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** The shard writer's three contracts: no sequence torn across files,
  * shard size bounded, and deterministic (re-run byte-identical) layout. */
class ShardWriterSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (0L until 400L).map { i =>
    (i, (0L to i % 29).map(j => s"t$j").mkString(" "),
      if (i % 4 == 0) "de" else "en", "s")
  }.toDF("doc_id", "text", "lang", "source")

  test("hive layout, bounded shard files, sequences never torn, round-trip") {
    val out = Files.createTempDirectory("shards").toString
    val packed = Curation.packSequences(corpus, seqLen = 64L)
    Curation.writeShards(packed, out, maxRecordsPerFile = 50L)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    dirs.toSet shouldBe Set("lang=de", "lang=en")

    // per-file: row cap respected, rows sorted. Per TASK (part-NNNNN
    // prefix — maxRecordsPerFile may split one task's output into several
    // bounded files): no seq_id spans two tasks within a lang, so a loader
    // consuming one task's shard group always gets whole sequences.
    val seen = scala.collection.mutable.Map.empty[(String, Long), String]
    dirs.foreach { d =>
      val lang = d.stripPrefix("lang=")
      val files = new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files.foreach { f =>
        val task = f.getName.split("-").take(2).mkString("-") // part-NNNNN
        val rows = spark.read.parquet(f.getAbsolutePath)
          .select("seq_id", "seq_offset")
          .as[(Long, Long)].collect()
        rows.length.toLong should be <= 50L
        rows.toSeq shouldBe rows.toSeq.sorted
        rows.map(_._1).distinct.foreach { sid =>
          withClue(s"seq $lang/$sid torn across ${seen.get((lang, sid))} and $task: ") {
            seen.getOrElseUpdate((lang, sid), task) shouldBe task
          }
        }
      }
    }

    // round-trip: the shard set is exactly the packed frame
    val back = spark.read.parquet(out)
      .select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val want = packed.select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    back shouldBe want
  }

  test("re-run writes an identical shard layout (deterministic)") {
    val a = Files.createTempDirectory("shardsA").toString
    val b = Files.createTempDirectory("shardsB").toString
    Curation.writeShards(Curation.packSequences(corpus, 64L), a, 50L)
    Curation.writeShards(Curation.packSequences(corpus, 64L), b, 50L)
    def layout(dir: String) =
      new java.io.File(dir).listFiles().filter(_.isDirectory).flatMap { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
          val rows = spark.read.parquet(f.getAbsolutePath)
            .select("doc_id", "seq_id", "seq_offset")
            .as[(Long, Long, Long)].collect().toSeq
          (d.getName, rows)
        }
      }.toSeq.sortBy(x => (x._1, x._2.headOption.map(_._1).getOrElse(-1L)))
    layout(a).map(_._2) shouldBe layout(b).map(_._2)
  }
}
