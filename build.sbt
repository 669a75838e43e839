ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awsetlproject2fiapspark"
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
// Suppress sbt's "[success] Total time: ..." epilogue: the bench driver
// captures a bounded 2000-char stdout TAIL and parses its final line as
// JSON — with the epilogue on, that final line is sbt's, never ours, and
// every round's BENCH_r*.json recorded parsed:null (r10 verdict #3).
// With it off, graft.Bench's compact summary line is the last stdout
// line. Pass/fail still travels on the exit code (the driver records rc).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forked `run` output passes through RAW (no "[info] " logger prefix):
// the bench driver parses the final stdout line as JSON, and with the
// default LoggedOutput strategy every line the bench prints arrives as
// "[info] {...}" — unparseable (r11 verdict: BENCH_r11.json parsed:null
// with the summary line present but prefixed).
run / outputStrategy := Some(StdoutOutput)
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
  // 16g default: the bench runs 40 queries in one JVM at local[32];
  // at 8g the heavier LSH queries GC-thrash and their timings swing 3×
  // run-to-run (observed d2 5.5s..18s). The env var still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
