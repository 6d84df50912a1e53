ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tensorbasespark"
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
// The per-round driver parses the LAST stdout line of `sbt "runMain
// graft.Bench"` as JSON. Two pieces of sbt chrome defeated that in rounds
// 1-4 (BENCH_r0*.json all show parsed:null): the logger's "[info] " prefix
// on forked-run output, and the trailing "[success] Total time" banner.
// Route the forked process's stdout straight through, and drop the banner.
run / connectInput := false
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(run / connectInput, Global / showSuccess)
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
  // 32 executor threads persisting columnar intermediates thrash an 8g
  // heap (round-4 driver bench: the persist-heavy queries ran 9-13x their
  // local times under memory pressure); the box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-Xms4g",
)
