ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "upflowspark"
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
// Diagnostic/scratch mains (Probe*, PlanDump, scale harness) live in a
// separate source directory so src/main holds only product + harness
// code (r11 VERDICT item 6); they still compile into Compile so
// `runMain graft.ProbeHot` and the direct-java loop keep working.
Compile / unmanagedSourceDirectories +=
  baseDirectory.value / "src" / "tools" / "scala"
// Forked run output passes through unprefixed — the driver parses
// Bench's single JSON line from stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver parses the LAST stdout line as JSON; sbt's trailing
// "[success] Total time: ..." line broke that in round 1 (BENCH_r01.json
// "parsed": null). Suppress it so Bench's JSON line is genuinely last.
Global / showSuccess := false
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
  // 24g default: the bench session holds the timed pass's memoized
  // artifacts (checkpoint blocks) on top of 32-thread execution memory;
  // 8g ran the r5 timed pass into GC/block-eviction pressure. The host
  // has 128 GiB; a real cluster sizes executor memory the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Pre-commit the whole heap: with a lazily-grown ParallelGC heap the
  // r8 bench GC log showed 8.5 s / 6.0 s YOUNG pauses at ~8 GB
  // committed (generation-resize thrash under 32-thread allocation),
  // 30 s of total pause time across the run. -Xms = -Xmx sizes the
  // generations once and removes the growth pauses entirely.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Throughput collector: the bench is a batch workload (no latency
  // SLO) and G1's concurrent cycles showed up as multi-second pauses
  // scattered over individual timed queries (a 0.3 s windowed agg
  // measuring 3.5 s). Parallel GC trades pause predictability for
  // throughput, which is exactly the right trade here and on batch
  // Spark executors generally.
  "-XX:+UseParallelGC",
)
