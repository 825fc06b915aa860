package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic for optimization round 21 — NOT part of any contract.
  * Interleaved A/B (min-of-5, one JVM): pageRank driver fold (default gate)
  * vs distributed iteration (gate=0), composed as dedup_pagerank composes
  * it. Result equality asserted before timing. */
object Diag21d {
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

    def prNew(): DataFrame = Graph.pageRank(docs, PortableDedup.lshPairs(docs))
    def prOld(): DataFrame =
      Graph.pageRank(docs, PortableDedup.lshPairs(docs), maxDriverGraph = 0L)

    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val po = rows(prOld()); val pn = rows(prNew())
    assert(po == pn, s"pagerank diverged: old=${po.size} new=${pn.size}")
    println(s"equal: pagerank ${po.size} rows")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "pagerank_old" -> (() => prOld()), "pagerank_new" -> (() => prNew()))
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
