package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  * A failed query is visibly marked: its name lands in `errors` with the
  * exception text and is excluded from the total, so a broken query can
  * never masquerade as a fast one. */
object Bench {
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session / codegen / parquet-footer init so the first
    // measured query isn't charged for JVM warm-up (reads 1 row per table)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try {
      graft.etl.Tables.events(spark, sfDir).limit(1).count()
      graft.etl.Tables.documents(spark, sfDir).limit(1).count()
      graft.etl.Tables.embeddings(spark, sfDir).limit(1).count()
    } catch { case _: Throwable => () }
    // INTERLEAVED median-of-N (default 3): the suite is swept end-to-end N
    // times (pass 1 over every query, then pass 2, then pass 3) and each
    // query reports the MEDIAN of its per-pass times. Interleaving decouples
    // a transient host-noise burst from any single query (it lands on
    // different queries each pass), and the median discards the one
    // contaminated sample — min-of-2 from a single pass could freeze a
    // noise spike into the artifact (it did, twice: rounds 7 and 8).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // dev-loop filter: comma-separated query names; unset = full suite
    // (the driver never sets it, so the contract output is unchanged)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None        => SparkEntry.queries
    }
    // diagnostic knob (driver never sets it): SPARK_GRAFT_BENCH_ORDER=desc
    // reverses the per-pass sweep order. Two quiet runs, one per order at
    // the same HEAD, separate a family-shaped timing drift into
    // position-in-suite effects (JIT/code-cache warm-up — the drift
    // follows the order) vs real per-query cost (it follows the family);
    // used for the r18 docs/dedup drift experiment (SCALING_r18.md).
    val ordered0 = selected.toSeq.sortBy(_._1)
    val ordered =
      if (sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("desc"))
        ordered0.reverse
      else ordered0
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var pass = 0
    while (pass < runs) {
      ordered.foreach { case (name, fn) =>
        if (!failed.contains(name)) {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            samples(name) = sec :: samples.getOrElse(name, Nil)
          } catch { case e: Throwable =>
            failed(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
            samples.remove(name)
          }
        }
      }
      pass += 1
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val ok = ordered.collect { case (name, _) if samples.contains(name) =>
      (name, median(samples(name)))
    }
    // the MIN is also reported (metric stays the median): min-of-N is what
    // earlier rounds froze, so carrying both keeps cross-round comparisons
    // one subtraction instead of a re-run under the old protocol
    val okMin = ordered.collect { case (name, _) if samples.contains(name) =>
      (name, samples(name).min)
    }
    val qs = ok.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val qsMin = okMin.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    // stdout-sized per-query map: medians rounded to 3 decimals (~7 KB for
    // 255 queries — half the size of the two full-precision maps whose
    // inline form round 9's driver log capture truncated to parsed:null).
    // Restores the driver's per-query PERF comparison and scaling block
    // (r20 verdict: PERF_r20.per_query was empty because the stdout line
    // carried only totals); full-precision maps still go to the file below.
    val qsRounded = ok.map { case (k, v) =>
      s""""${esc(k)}":${math.rint(v * 1000) / 1000}""" }
      .mkString("{", ",", "}")
    val errs = failed.map { case (k, m) => s""""${esc(k)}":"${esc(m)}"""" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val totalMin = okMin.map(_._2).sum
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","n_ok":${ok.size},"n_failed":${failed.size},"runs_per_query":$runs,"agg":"median","protocol":"interleaved-median-of-$runs","value_min":$totalMin,"sf":"${esc(sfDir)}","errors":$errs,"queries":$qsRounded,"detail_file":"${esc(outPath)}"}"""
    println(summary)
    // the loss-proof full artifact: summary fields + both per-query maps
    val line = s"""{"metric":"total","value":$total,"unit":"sec","n_ok":${ok.size},"n_failed":${failed.size},"runs_per_query":$runs,"agg":"median","protocol":"interleaved-median-of-$runs","value_min":$totalMin,"sf":"${esc(sfDir)}","errors":$errs,"queries":$qs,"queries_min":$qsMin}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: $e")
    }
    spark.stop()
  }
}
