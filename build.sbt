ThisBuild / scalaVersion := "2.13.17"
ThisBuild / scalacOptions ++= Seq("-deprecation", "-unchecked")
ThisBuild / version := "0.1.0"
name := "simpledataworkflowspark"
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
// Pass the forked JVM's stdout through bare (no [info] prefix) so the
// final line of `sbt "runMain graft.Bench"` is the bench JSON itself.
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
// Default driver heap: half of physical RAM, clamped to [4g, 48g] — 48g
// over local[32] = 1.5 GB/core, the standard cluster provisioning band
// (2-4 cores/executor at 8-16g; the old flat 8g gave 0.25 GB/core and
// array-heavy sf10 verification joins OOM'd under it), while a flat 48g
// would fail to even start on a smaller box. SPARK_DRIVER_MEM overrides.
def defaultHeap: String = {
  val physGb =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getTotalMemorySize >> 30
      case _                                           => 0L
    } catch { case _: Throwable => 0L }
  if (physGb <= 0L) "8g" else s"${math.max(4L, math.min(48L, physGb / 2))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)
