ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataqualitycheckspark"
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
// POSIX-locale hosts make the JVM's filename codec ASCII, which breaks the
// workbook sheets' Chinese filenames (sun.jnu.encoding is locale-derived
// and NOT overridable via -D) — force a UTF-8 locale into forked JVMs
Test / envVars += "LC_ALL" -> "C.UTF-8"
run / envVars += "LC_ALL" -> "C.UTF-8"
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
  // 16g default: the bench's near-dup series caches signature/band frames
  // at n=3M — 8g fails the broadcast build under that cache pressure.
  // -Xms pinned to -Xmx: without it the heap grows from the tiny default
  // during the FIRST full-n timed run of a fresh JVM, and the expansion +
  // GC pauses systematically depress that round 4-5x (both round-5 bench
  // windows showed it: with-dedup session-1 rounds 42k/35k files/s vs
  // 181-197k once the heap is grown) — pre-sizing removes the artifact
  // from every first-round measurement
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
