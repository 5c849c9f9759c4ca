ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbttpchspark"
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
// The bench/verify contract is "last stdout line is bare JSON". Two sbt
// behaviors break that: the default LoggedOutput strategy prefixes every
// forked-run line with "[info] ", and the "[success] Total time" banner
// prints AFTER the program's last line. Pass run output through raw and
// drop the banner so the JSON line is the literal final stdout line.
outputStrategy := Some(StdoutOutput)
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
// Commit the whole heap once at JVM start (-Xms == -Xmx + AlwaysPreTouch).
// On this virtualized host a 4K anonymous-page fault costs ~15 us of pure
// kernel time (~50x a bare-metal fault; measured: first touch of 32 GB =
// 16.5 s across 16 threads, 0.37 s re-touch after pretouch). Without this,
// G1's commit-on-demand + uncommit-after-GC cycle re-faults heap regions
// continuously and a 32-thread run degrades into 97% system time — the
// "intermittent multi-minute host stalls" that contaminated the round-3
// bench sweeps. Pretouch pays the fault cost once, before main() runs.
val heap = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms$heap", s"-Xmx$heap", "-XX:+AlwaysPreTouch",
)
