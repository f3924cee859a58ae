ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "intelligentfrauddetectionsystemusingmachinelearningandhadoopspark"
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
// Forked `run` output normally gets sbt's `[info] ` prefix, which made the
// one-line bench/verify JSON unparseable for the driver (BENCH_r02
// `parsed: null`). StdoutOutput passes the child's stdout through raw.
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
  // 16g default: 47 bench queries in one JVM at local[32] showed 1-2s/query
  // GC interference at 8g (q28/q36 isolated-vs-full-run deltas)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // pin the initial heap to the max: G1 uncommits pages after a full
  // GC and the next query re-commits them INSIDE its timed region —
  // with the r20 between-queries GC cadence that churn showed up as a
  // broad +0.5-2 s/query tax (r20 gcA run); a pinned heap never
  // uncommits
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
