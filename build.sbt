ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "storagecrawlerspark"
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
// Forked `run` output must reach stdout RAW: the default LoggedOutput
// strategy prefixes every line with "[info] ", which breaks any
// json.loads over graft.Bench's one-line stdout contract (the driver
// parses a 2000-char stdout tail for it).
outputStrategy := Some(StdoutOutput)
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
  // graft.crawl.PathBytes: raw readdir bytes for bytea-parity paths
  "java.base/sun.nio.fs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Dfile.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// a POSIX-locale JVM maps filesystem paths through ASCII and crashes on
// non-ASCII filenames (sun.nio.fs.UnixPath.encode); sun.jnu.encoding is
// fixed from the native locale at JVM start, so the forked processes
// need a UTF-8 locale in their environment, not a -D flag
Test / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
run / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
scalacOptions ++= Seq("-deprecation")
// The per-round driver keeps only the LAST ~2000 chars of stdout and
// parses graft.Bench's one-line JSON out of that tail; sbt's
// "[success] Total time: ..." epilogue prints AFTER the JSON line and
// has helped eat the artifact every round (BENCH_r01..r09 all ship
// "parsed": null). Suppress the epilogue so the bench JSON is the last
// stdout line of the sbt invocation.
Global / showSuccess := false
Global / showTiming := false
