ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hasqllite2influxdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses the FINAL stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two sbt behaviors defeat that: forked output is re-logged with
// an "[info] " prefix, and a "[success] Total time…" banner prints after
// it. Un-prefix forked run output and drop the banner so the Bench/Verify
// summary line IS the last stdout line, verbatim.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not another setting —
// exclude it from the unused-key lint
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs 32 executor threads in one JVM; 8g thrashes GC under
  // the shuffle-heavy dedup queries (the box has 128 GiB — see TESTDATA.md)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
