ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "skopeapispark"
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
// Forked run output must reach stdout RAW (no "[info] " logger prefix):
// the bench driver machine-parses the one JSON line Bench prints, and a
// logger prefix breaks that parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and the driver reads only the LAST 2000 chars of output: sbt's
// "[success] Total time: ..." epilogue (~75 chars) would eat that
// budget right where the bench JSON line sits, so suppress it.
ThisBuild / showSuccess := false
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
// local[32] with 32 shuffle partitions needs heap headroom or the bench
// GC-thrashes (measured 5x wall-clock swing at 8g). Size by the host:
// big boxes get the bench heap, ordinary dev machines a safe default —
// SPARK_DRIVER_MEM overrides either way.
val defaultHeap: String = {
  val hostGb =
    try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .find(_.startsWith("MemTotal"))
        .map(_.replaceAll("[^0-9]", "").toLong / 1048576L)
        .getOrElse(0L)
    } catch { case _: Throwable => 0L }
  if (hostGb >= 96) "48g" else "8g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)
