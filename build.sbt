ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "azuredatalakeindexerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one local SparkSession (and one streaming checkpoint
// namespace); run them sequentially
Test / parallelExecution := false
run / fork := true
// The driver parses the bench's one-line JSON from raw stdout. With the
// default LoggedOutput strategy sbt prefixes every forked-run stdout
// line with "[info] " (and stderr with "[error] "), which has made the
// line unparseable in every round's BENCH artifact (r16 verdict #1:
// `parsed: null` since r01). StdoutOutput passes the forked JVM's
// streams through untouched; showSuccess drops the "[success] Total
// time" epilogue so the JSON stays the last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
  // 24g default: a round-9 sf10 bench series at the old 8g default lost
  // localCheckpoint blocks to heap pressure and recorded 14 spurious
  // query failures (all green at 32g). The single-JVM local[32] runtime
  // is both driver and executor, so it needs executor-grade heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
