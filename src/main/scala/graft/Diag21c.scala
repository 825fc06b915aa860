package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic for optimization round 21 — NOT part of any contract.
  *
  * Interleaved A/B (min-of-5, one JVM) for the size-adaptive driver
  * strategies, using the strategy-gate parameters to pin OLD (distributed,
  * gate=0) vs NEW (driver, default gate) in the same session:
  *  - canonicalClusters: union-find collect vs label-propagation loop,
  *    composed exactly as the declared queries compose it (portable LSH
  *    pairs → clusters; production minhash LSH → clusters).
  *  - bpeTrain: one-collect driver merge loop vs the distributed
  *    TakeOrdered rounds (the r20 form; the r21-prev per-round driver
  *    argmax sits between them — its anchor is the committed baseline
  *    detail file).
  * Result-set equality is asserted before timing.
  */
object Diag21c {
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

    def ccNew(): DataFrame =
      Dedup.canonicalClusters(PortableDedup.lshPairs(docs))
    def ccOld(): DataFrame =
      Dedup.canonicalClusters(PortableDedup.lshPairs(docs), maxDriverEdges = 0L)
    def clNew(): DataFrame = Dedup.canonicalClusters(
      Dedup.minhashLsh(docs, shingleK = 2, bands = 16, rowsPerBand = 2,
        threshold = 0.05).select("doc_a", "doc_b"))
    def clOld(): DataFrame = Dedup.canonicalClusters(
      Dedup.minhashLsh(docs, shingleK = 2, bands = 16, rowsPerBand = 2,
        threshold = 0.05).select("doc_a", "doc_b"), maxDriverEdges = 0L)
    def bpeNew(): DataFrame = TextAnalysis.bpeTrain(docs)
    def bpeOld(): DataFrame = TextAnalysis.bpeTrain(docs, 30, maxDriverWords = 0L)

    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val co = rows(ccOld()); val cn = rows(ccNew())
    assert(co == cn, s"cc diverged: old=${co.size} new=${cn.size}")
    val lo = rows(clOld()); val ln = rows(clNew())
    assert(lo == ln, s"clusters diverged: old=${lo.size} new=${ln.size}")
    val bo = rows(bpeOld()); val bn = rows(bpeNew())
    assert(bo == bn, s"bpe diverged: old=${bo.size} new=${bn.size}")
    println(s"equal: cc ${co.size} rows, clusters ${lo.size} rows, bpe ${bo.size} rows")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "cc_old" -> (() => ccOld()), "cc_new" -> (() => ccNew()),
      "clusters_old" -> (() => clOld()), "clusters_new" -> (() => clNew()),
      "bpe_old_r20" -> (() => bpeOld()), "bpe_new" -> (() => bpeNew()))
    variants.foreach { case (_, f) => time(f) }
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 0 until 5; (n, f) <- variants) acc(n) = time(f) :: acc(n)
    for ((n, _) <- variants) {
      val ts = acc(n)
      println(f"$n%-14s min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
