ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "incubytevaccinationdatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// the container's platform default is US-ASCII; pin source encoding so
// non-ASCII string literals read correctly instead of as mojibake
ThisBuild / scalacOptions ++= Seq("-encoding", "UTF-8")
Test / fork := true
run / fork := true
// Forked `run` output normally flows through sbt's logger, which stamps
// every stdout line with "[info] " — that prefix is what kept the
// driver's JSON parse of the Bench contract line failing ("parsed":
// null in BENCH_r14/r15). StdoutOutput hands the forked JVM's stdout
// through verbatim, so the one-line JSON lands unprefixed and
// machine-parseable in the output tail.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] runs 32 concurrent tasks whose shuffle/aggregation buffers
  // plus retained localCheckpoint blocks easily exceed 8g — an undersized
  // heap turns the tail of a long query suite into GC thrash (measured:
  // 1.8s queries inflating to 20s+ once the heap fills).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
