ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mqtt2clickhousespark"
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
// Pass forked-run output through raw (no [info] prefix): the driver
// tail-parses the bench process's last stdout line as JSON.
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
  // Force the sort-based shuffle writer everywhere (r12, measured with
  // examples/MicroProbe): the bypass-merge writer opens one spill file
  // per reduce partition per map task, and on this filesystem that
  // costs ~6ms CPU per file — a small-frame 64-task stage burned 15.5s
  // of task time that the sort writer (one file per map task) does in
  // 2.4s. The sort path is already Spark's default above 200 reduce
  // partitions; this pins it for the ≤200 range our 32-partition
  // sessions always sit in.
  // overridable for A/B runs: SPARK_SHUFFLE_BYPASS_THRESHOLD=200
  // restores Spark's default (bypass writer at ≤200 reduce partitions)
  s"-Dspark.shuffle.sort.bypassMergeThreshold=${
    sys.env.getOrElse("SPARK_SHUFFLE_BYPASS_THRESHOLD", "0")}",
  // 48g default (box has 125g): at 16g the full 196-query suite ran
  // under constant old-gen pressure from the session-lifetime artifact
  // caches + thousands of codegen classes — measured 156.9s -> 142.4s
  // for the identical suite by raising the heap alone (r12)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // GC choice overridable for A/B runs: SPARK_DRIVER_GC=UseParallelGC
  s"-XX:+${sys.env.getOrElse("SPARK_DRIVER_GC", "UseG1GC")}",
  // 200 queries × whole-stage codegen = thousands of generated classes;
  // the JVM default 240 MB code cache silently flushes/deopts mid-run,
  // which shows up as roaming 10-50x per-query slowdowns. 512m was
  // enough until r12's surface: the 42-probe ScaleStress sweep then
  // showed the same signature intermittently (a pure per-row map
  // reading 0.3s on one run and 30s on the next, min-of-two BOTH slow
  // — a flush window outlasts back-to-back samples). At 1g three
  // consecutive sweeps ran clean. Overridable for A/B runs.
  s"-XX:ReservedCodeCacheSize=${
    sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
