ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bqfetchspark"
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
// Inherit stdout directly instead of routing through sbt's logger: the
// logger prefixes every line with "[info] ", which breaks downstream
// parsers that expect Bench's bare one-line JSON on stdout.
run / outputStrategy := Some(StdoutOutput)
// ...and drop the trailing "[success] Total time..." line for the same
// reason: with both set, a runMain's last stdout line is the app's own.
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Parallel forked test groups were TRIED and REJECTED in round 18: 4
// weight-balanced suite groups in 4 concurrent JVMs (own SparkSession +
// warehouse dir each) read 1361 s and 1174 s wall against 956 s
// sequential on the same host — per-test durations inflated ~2.6×
// across the board (DocumentStreamsSpec 14.5 → 372 s), i.e. the tiny
// fixture-scale jobs here are scheduler-latency-bound and concurrent
// local-mode sessions interfere far more than they parallelize. The
// suite stays in ONE forked JVM; its wall-time lever is the shared
// session's codegen class cache (TestSpark, round 18).
