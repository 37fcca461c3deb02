ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "genesapiclispark"
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
// The driver's bench gate keeps the last ~2.3 KB of the sbt log and
// parses the LAST line as JSON. Two sbt default behaviors broke that
// for three rounds (BENCH_r04-r06 all `parsed: null`):
//   1. forked-run output is routed through sbt's logger, which wraps
//      every line in "[info] " → the summary line is never bare;
//   2. sbt appends its own "[success] Total time: …" line after the
//      run → the summary line is never last.
// StdoutOutput passes the forked JVM's stdout through verbatim, and
// showSuccess kills the trailer — Bench's `{"metric":"total",…}` line
// is then the literal last line of the captured tail.
run / outputStrategy := Some(StdoutOutput)
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
  // Forked JVMs on this POSIX-locale box default file.encoding to
  // US-ASCII (r16 advice: LintCollect's Source.fromFile threw on every
  // em-dash and the gate went vacuously green). Sources are UTF-8;
  // make every forked main/test locale-independent.
  "-Dfile.encoding=UTF-8",
  // 24g default: at 8g the 74-query bench GC-thrashes in its second
  // half (measured 84s total vs 36s; single-query times 7x inflated).
  // The machine has 125 GiB; SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
