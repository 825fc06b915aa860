package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic for optimization round 21 — NOT part of any contract.
  *
  * Interleaved A/B (min-of-5, one JVM — the r21 methodology for the bursty
  * host): OLD distinct-then-filter vs NEW filter-then-distinct tails for
  * media_feature_neardup_lsh and dedup_simhash, plus a result-set equality
  * assertion (the filter commutes with the distinct because the filtered
  * column is functionally determined by the pair key).
  */
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

    // ---- media_feature_neardup_lsh: OLD tail (distinct before filter),
    // body copied verbatim from Multimodal.featureNearDupsBucketed
    def mediaOld(): DataFrame = {
      val threshold = 0.9999; val sampleMod = 2; val bandBits = 16; val bands = 16
      val media = Multimodal.asMediaTable(docs)
      val sigs = (0 until (bands * bandBits + 63) / 64).map { w =>
        Similarity.signSketch(col("features").cast("array<float>"),
          math.min(64, bands * bandBits - w * 64), 8, planeOffset = w * 64)
          .as(s"sig_$w")
      }
      val sketched = Multimodal.extractFeatures(
          media.filter(col("doc_id") % sampleMod === 0))
        .select(Seq(col("doc_id"), col("features"),
          sqrt(Similarity.ddot(col("features"), col("features"))).as("nrm")) ++
          sigs: _*)
      val banded = sketched.select(col("doc_id"), col("features"), col("nrm"),
          posexplode(array((0 until bands).map { b =>
            val bit = b * bandBits
            shiftright(col(s"sig_${bit / 64}"), bit % 64)
              .bitwiseAND(lit((1L << bandBits) - 1))
          }: _*))
            .as(Seq("band", "bkey")))
        .repartition(col("band"), col("bkey"))
      val cos = Similarity.ddot(col("a.features"), col("b.features")) /
        (col("a.nrm") * col("b.nrm"))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          round(cos, 6).as("cosine"))
        .distinct()
        .filter(col("cosine") >= threshold)
    }
    def mediaNew(): DataFrame =
      Multimodal.featureNearDupsBucketed(Multimodal.asMediaTable(docs))

    // ---- dedup_simhash: OLD tail (distinct on (pair, sigs) before the
    // hamming filter), body copied verbatim from Dedup.simhashPairs
    def simhashOld(): DataFrame = {
      val maxDist = 10
      val sig = Dedup.simhash(docs)
      val chunked = sig.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
          .as(Seq("chunk", "ckey")))
        .repartition(col("chunk"), col("ckey"))
      val cands = chunked.as("a").join(chunked.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
        .distinct()
      cands
        .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= maxDist)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    }
    def simhashNew(): DataFrame = Dedup.simhashPairs(docs, maxDist = 10)

    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    // equality proof
    val mo = rows(mediaOld()); val mn = rows(mediaNew())
    assert(mo == mn, s"media result diverged: old=${mo.size} new=${mn.size}")
    val so = rows(simhashOld()); val sn = rows(simhashNew())
    assert(so == sn, s"simhash result diverged: old=${so.size} new=${sn.size}")
    println(s"equal: media ${mo.size} rows, simhash ${so.size} rows")

    def planOf(df: DataFrame): String = {
      df.queryExecution.toRdd.count(): Unit
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "media_old" -> (() => mediaOld()), "media_new" -> (() => mediaNew()),
      "simhash_old" -> (() => simhashOld()), "simhash_new" -> (() => simhashNew()))
    for ((n, f) <- variants) {
      println(s"===PLAN $n===")
      println(planOf(f()))
      println(s"===ENDPLAN $n===")
    }
    // one warm pass each, then interleaved 5 passes
    variants.foreach { case (_, f) => time(f) }
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 0 until 5; (n, f) <- variants) acc(n) = time(f) :: acc(n)
    for ((n, _) <- variants) {
      val ts = acc(n)
      println(f"$n%-12s min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
