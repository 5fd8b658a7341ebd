ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "periodicityspark"
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
// The driver captures only a tail of stdout and parses the LAST line
// as the bench contract JSON — sbt's "[success] Total time ..."
// banner printed after the forked main's output has beheaded that
// parse every round (BENCH_r01..r14 all `parsed: null`). Suppress it
// so graft.Bench's compact JSON line is the final stdout line.
Global / showSuccess := false
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
  // A timestamp[ns] parquet refresh must reach Tables.tsMicros'
  // LongType branch, not die in the reader with "Illegal Parquet
  // type" (inert for timestamp[us] data).
  "-Dspark.sql.legacy.parquet.nanosAsLong=true",
  // 16g default: the full 68-query bench in one JVM showed GC storms
  // at 8g (cache eviction attributed to whichever query was running).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
