package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic for optimization round 21 — NOT part of any contract. */
object Diag21 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = graft.etl.Tables.documents(spark, sfDir)

    def variant(mode: Int): DataFrame = {
      val tau = 4; val sigLen = 64; val minLen = 8
      val nseg = tau + 1
      val base = if (mode == 0) docs else graft.etl.Tables.fanOut(docs)
      var sigs = base.select(
          col("doc_id"),
          substring(lower(regexp_replace(col("text"), "[^A-Za-z ]", "")),
            1, sigLen).as("sig"))
        .withColumn("n", length(col("sig")))
        .filter(col("n") >= minLen)
      if (mode == 2) sigs = sigs.localCheckpoint()
      val seg = sigs
        .withColumn("slot", explode(typedLit((0 until nseg).toArray)))
        .withColumn("base", expr(s"n div $nseg"))
        .withColumn("rem", col("n") % nseg)
        .withColumn("len",
          when(col("slot") < col("rem"), col("base") + 1).otherwise(col("base")))
        .withColumn("start",
          lit(1) + col("slot") * col("base") + least(col("slot"), col("rem")))
        .select(col("doc_id").as("id_a"), col("n").as("l"), col("slot"),
          expr("substring(sig, start, len)").as("piece"))
      val probe = sigs
        .withColumn("l", explode(sequence(col("n") - tau, col("n") + tau)))
        .filter(col("l").between(minLen, sigLen))
        .withColumn("slot", explode(typedLit((0 until nseg).toArray)))
        .withColumn("d", explode(typedLit((-tau to tau).toArray)))
        .filter(abs(col("d")) + abs(col("n") - col("l") - col("d")) <= tau)
        .withColumn("base", expr(s"l div $nseg"))
        .withColumn("rem", col("l") % nseg)
        .withColumn("len",
          when(col("slot") < col("rem"), col("base") + 1).otherwise(col("base")))
        .withColumn("start",
          lit(1) + col("slot") * col("base") + least(col("slot"), col("rem")) + col("d"))
        .filter(col("start") >= 1 &&
          col("start") + col("len") - 1 <= col("n"))
        .select(col("doc_id").as("id_b"), col("n").as("n_b"), col("l"),
          col("slot"), expr("substring(sig, start, len)").as("piece"))
      val cand = seg.join(probe, Seq("l", "slot", "piece"))
        .filter(col("id_a") =!= col("id_b") &&
          abs(col("l") - col("n_b")) <= tau)
        .select(least(col("id_a"), col("id_b")).as("doc_a"),
          greatest(col("id_a"), col("id_b")).as("doc_b"))
        .distinct()
      cand
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("sig_a"), col("sig_b"), tau).cast("long").as("dist"))
        .filter(col("dist") >= 0)
    }
    println("rows: " + (0 to 2).map(m => variant(m).count()).mkString(","))
    val t = Array.fill(3)(List.empty[Double])
    for (_ <- 0 until 5; m <- 0 to 2) {
      val t0 = System.nanoTime(); variant(m).count()
      t(m) = (System.nanoTime() - t0) / 1e9 :: t(m)
    }
    for (m <- 0 to 2)
      println(f"variant$m min=${t(m).min}%.3f med=${t(m).sorted.apply(2)}%.3f all=${t(m).map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
