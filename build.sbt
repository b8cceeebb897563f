ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nemsisxmlparserspark"
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
// Forked-run output normally passes through sbt's logger, which
// prefixes every line with "[info] " — that prefix broke the driver's
// last-line `json.loads` of the bench summary four rounds running.
// StdoutOutput makes the forked JVM inherit the real stdout/stderr,
// so the compact summary line lands unprefixed.
run / outputStrategy := Some(StdoutOutput)
// outputStrategy is read by the fork runner, not by a task sbt's lint
// can see — exclude it so the lint warning doesn't pollute stdout.
Global / excludeLintKeys += run / outputStrategy
// The driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as the metric JSON; sbt's "[success] Total time ..." footer printed
// after main returns broke that contract two rounds running. Suppress
// it globally (it carries no information the exit code doesn't).
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
  // 8g throttled the 99-query bench with GC (whole-suite times 25%
  // over isolated runs, CC-family queries 2x); 24g restores isolated
  // timings in-suite. Local mode = driver heap IS executor memory.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 120-query suite x 3 passes generates thousands of whole-stage
  // codegen classes; the JIT code cache's default 240 MB silently
  // flushes+recompiles under that churn (UseCodeCacheFlushing), which
  // taxes exactly the many-stage iterative queries.
  "-XX:ReservedCodeCacheSize=1g",
)
