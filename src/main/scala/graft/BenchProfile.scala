package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** OPTIMIZATION-ROUND MEASUREMENT HARNESS (guide §1: measure first) — not
  * part of the driver contract. Runs selected queries under the exact Bench
  * session shape and reports, per query: wall seconds (median of 3 after one
  * warm pass), Spark job / stage / task counts, summed task time, shuffle
  * read+write bytes, and peak single-task time. This is the local stand-in
  * for the Spark UI stage page (spark.ui is disabled in the bench), so the
  * per-query cost can be attributed to scheduling overhead (many tiny
  * stages) vs shuffle volume vs compute before anything is changed.
  *
  * Usage: SPARK_GRAFT_PROFILE=q1,q2 sbt "runMain graft.BenchProfile [sfDir]"
  * Unset SPARK_GRAFT_PROFILE profiles the 25 most expensive queries from the
  * committed r20 bench record.
  */
object BenchProfile {
  private class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shuffleReadB = new AtomicLong
    val shuffleWriteB = new AtomicLong
    val maxTaskMs = new AtomicLong
    val spillB = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillB.addAndGet(m.memoryBytesSpilled)
        maxTaskMs.accumulateAndGet(m.executorRunTime, (a, b) => math.max(a, b))
      }
    }
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      shuffleReadB.set(0); shuffleWriteB.set(0); maxTaskMs.set(0); spillB.set(0)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try {
      graft.etl.Tables.events(spark, sfDir).limit(1).count()
      graft.etl.Tables.documents(spark, sfDir).limit(1).count()
      graft.etl.Tables.embeddings(spark, sfDir).limit(1).count()
    } catch { case e: Throwable =>
      // a bad sfDir would otherwise silently profile cold/missing tables
      System.err.println(s"profile warm-up failed for $sfDir: ${e.getMessage}")
    }

    val defaults = Seq("dedup_clusters", "topk_ivfpq", "pipeline_dedup_pack",
      "text_lr_train", "docs_bpe_merges", "dedup_lsh_quality",
      "dq_referential_bloom", "dedup_clusters_cc", "media_feature_neardup_lsh",
      "knn_graph", "dedup_survivors", "topk_pq", "dedup_fuzzy", "emb_kmeans",
      "topk_ivf", "dedup_jaccard_prefix", "text_bigram_logprob",
      "dedup_minhash_lsh", "dedup_jaccard_est", "dedup_pagerank",
      "text_cms_estimate", "text_cms_merge", "text_unigram_logprob",
      "text_contamination", "events_statistics_daily")
    val names = sys.env.get("SPARK_GRAFT_PROFILE")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaults)
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    println(f"${"query"}%-28s ${"med_s"}%7s ${"jobs"}%5s ${"stgs"}%5s ${"tasks"}%6s ${"taskS"}%7s ${"shRdKB"}%8s ${"shWrKB"}%8s ${"maxTkMs"}%8s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          fn(spark, sfDir).count() // warm
          // listener events are async: drain the warm run's events BEFORE
          // resetting, and drain again before reading, so the three timed
          // runs' counters are neither polluted nor truncated
          org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
          var walls = List.empty[Double]
          acc.reset()
          var i = 0
          while (i < 3) {
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            walls = (System.nanoTime() - t0) / 1e9 :: walls
            i += 1
          }
          org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
          val med = walls.sorted.apply(1)
          println(f"$name%-28s $med%7.3f ${acc.jobs.get / 3}%5d ${acc.stages.get / 3}%5d ${acc.tasks.get / 3}%6d ${acc.taskTimeMs.get / 3 / 1000.0}%7.2f ${acc.shuffleReadB.get / 3 / 1024}%8d ${acc.shuffleWriteB.get / 3 / 1024}%8d ${acc.maxTaskMs.get}%8d")
      }
    }
    spark.stop()
  }
}
