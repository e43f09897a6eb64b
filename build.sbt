ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tableaudashboardperformanceetlautomationspark"
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
// Forked runs default to sbt's LoggedOutput, which prefixes every stdout
// line with "[info] " — that breaks the driver's parse of Bench's one-line
// JSON result. StdoutOutput passes the forked process's stdout through raw.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver keeps only the LAST 2000 chars of the bench run's output.
// sbt's "[success] Total time: ..." epilogue (~77 chars) would evict the
// head of Bench's one-line JSON once the catalog is large — suppress it
// so the whole JSON line survives the tail cap (BENCH_r04..r07 came back
// "parsed": null exactly because of this).
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default (A/B at the 127-query catalog, same window: 50.6s @8g ->
  // 49.6s @24g — the full-catalog pass is GC-bound on its busiest
  // entries, sk03 1.56->1.16s). The container offers 128 GiB; embedders
  // override via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
