ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "arroyospark"
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
// r18 (VERDICT r17 #1): the driver parses Bench's one-line JSON from the
// stdout of `sbt "runMain graft.Bench"`. sbt's default LoggedOutput wraps
// every forked-process line with [info]/[error] prefixes, which broke that
// parse in every round since r14 (BENCH_r14..r17: parsed=null). StdoutOutput
// pipes the forked JVM's stdout/stderr through UNWRAPPED, and showSuccess
// drops the trailing "[success] Total time ..." footer — so the bare JSON
// line Bench prints after spark.stop() is the LAST line on stdout. Scoped to
// `run` (runMain shares run's fork settings); test output stays logged.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// the fork-options task consumes run/outputStrategy at runtime; sbt's
// static lint can't see that — verified working (bare JSON, r18)
Global / excludeLintKeys += run / outputStrategy
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
