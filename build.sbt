ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vicinityspark"
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
// The bench/verify driver tail-parses the LAST lines of sbt stdout for the
// one-line JSON report; route forked stdout through unprefixed (no "[info] ")
// and drop the trailing "[success] Total time" line so the JSON stays last.
run / outputStrategy := Some(StdoutOutput)
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
  // heap tracks the query surface (the host has 128 GiB; one forked JVM
  // runs at a time): at 8g the bench JVM GC-churned through the cached
  // stores + registry indexes and the most job-dense queries (q_evaluate,
  // q_gopher_rules) absorbed the collector pressure — 8g -> 16g -> 24g
  // measured 55.5 -> 51.6 -> 49.1 s at 117 queries (BENCH_NOTES r11);
  // at 135 queries the same cliff reappeared at 24g (evaluate 14.9 s,
  // gopher 7.0 s, total 99.4 s) and 48g restores shape (4.9 / 0.6 / 70.8)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "80g")}",
)
