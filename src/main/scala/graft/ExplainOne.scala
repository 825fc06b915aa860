package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the formatted plan of named queries (comma list in
  * SPARK_GRAFT_EXPLAIN) under the Bench session shape. Measurement-round
  * tool; not part of the driver contract. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val names = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN", "")
      .split(',').map(_.trim).filter(_.nonEmpty)
    val run = sys.env.get("SPARK_GRAFT_EXPLAIN_RUN").contains("1")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"### $n UNKNOWN")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          println(s"### $n")
          if (run) { // executed plan incl. AQE final + codegen spans:
            // drive THIS df's own QueryExecution to completion (noop/count
            // would build a fresh QueryExecution and leave df's adaptive
            // plan un-finalized)
            df.queryExecution.toRdd.count(): Unit
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          } else {
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          }
      }
    }
    spark.stop()
  }
}
