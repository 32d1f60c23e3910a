ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cdcconnectorspark"
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
// The harness tail-parses the bench's final stdout line as JSON. sbt's
// default LoggedOutput strategy prefixes every forked-run line with
// "[info] "/"[error] " and then appends its own "[success] Total time"
// line — both of which broke the parse in rounds 6-8 (BENCH_r0*.json
// "parsed": null). StdoutOutput passes the child's stdout/stderr through
// raw, and showSuccess=false drops the trailing success line, so the
// compact JSON emitted by graft.Bench is the literal last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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

// Probe/measurement harnesses (src/probe: the SCALE_SOAK cost probes +
// the scale data generator) compile onto the same classpath so
// `runMain graft.tools.*` works for soak reproduction, but they are NOT
// engine code: they live outside src/main (LoC accounting) and are
// excluded from the shipped jar below.
Compile / unmanagedSourceDirectories += baseDirectory.value / "src" / "probe" / "scala"
Compile / packageBin / mappings := (Compile / packageBin / mappings).value
  .filterNot { case (_, path) => path.startsWith("graft/tools/") }
