ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "innercircleetlspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// JSON; sbt's "[success] Total time ..." epilogue trailed it and broke the
// parse two rounds running (BENCH_r07/r08 "parsed": null). Suppress the
// epilogue (exit codes still carry success/failure) and pass the forked
// JVM's streams straight through — sbt's logger would otherwise prefix
// every stdout line with "[info] " in batch/non-tty invocations.
Global / showSuccess := false
// (showSuccess is consumed by sbt's command layer, which the unused-key
// lint cannot see — exclude it rather than warn every invocation)
Global / excludeLintKeys += showSuccess
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
  // fixtures built with java.sql.Timestamp parse in the JVM default zone;
  // pin it so specs/gates don't silently depend on a UTC host
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
