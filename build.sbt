ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mycudfspark"
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
// Pass the forked JVM's stdout/stderr through verbatim instead of
// re-logging each line with an [info]/[error] prefix — the bench/verify
// drivers parse the emitted JSON lines directly from the process output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 24g default (machine has 128 GiB): the r9 driver bench peaked at
  // 5.4 GB live heap with 15 s cumulative GC at 8g — the iterative
  // queries (pagerank, CC split) were paying neighbor GC tax. Headroom
  // keeps per-group GC deltas flat so bench numbers measure the query,
  // not the collector.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // r11: the headline bench grew to 60 whole-stage-codegen'd queries;
  // JDK 17's default 240 MB reserved code cache starts flushing warm
  // nmethods under that load, so later groups re-JIT mid-measurement
  // (the suspected r10 group-neighbor drift on unchanged plans). Bench
  // prints per-group code-cache occupancy as evidence.
  "-XX:ReservedCodeCacheSize=512m",
)
