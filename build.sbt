ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlpipelinespark"
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
// The bench driver parses the LAST stdout line as JSON; two pieces of
// sbt decoration kept BENCH_r14..r17 at parsed:null and both go here:
// (a) the "[success] Total time: ..." banner printed after the forked
// JVM exits (exit codes still carry pass/fail; failures still print),
// (b) the "[info] " prefix sbt's logger stamps on every forked-process
// stdout line — StdoutOutput pipes the fork's stdout through verbatim.
Global / showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy,
  Compile / run / outputStrategy, Compile / runMain / outputStrategy)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The JUnit XML listener dies (MalformedInputException) when a failure
// message contains a lone UTF-16 surrogate, aborting the whole forked
// harness mid-run. ScalaTest console output is the source of truth here;
// drop the XML reports so a weird failure message can't truncate the run.
disablePlugins(JUnitXmlReportPlugin)
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
