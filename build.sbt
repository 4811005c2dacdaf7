ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tranquilityspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// per-test durations in the report (-oD): the r10 driver's `sbt test` run
// was cut off mid-suite with no way to see WHICH suites spend the time —
// durations make every future run self-attributing
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
run / fork := true
// Pass the forked run JVM's stdout through UNDECORATED: the default
// LoggedOutput prefixes every line with "[info] ", which has broken the
// driver's bench-JSON parse since round 7 (every BENCH_r*.json carries
// "parsed": null because the final compact line arrives as `[info] {...}`).
// With StdoutOutput the bare JSON is the last stdout line sbt itself does
// not own (sbt's trailing "[success] …" goes through its logger).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ {
  // A LARGE lazily-committed heap is a measurement hazard on virtualized
  // hosts: G1 sizes young gen up to 60% of -Xmx, and growing into
  // never-touched pages turns every young GC into a hypervisor
  // page-fault storm (measured r10: minhash_near_dups 0.8-1.0 s at
  // -Xmx8g vs 10-68 s WILDLY VARIANT at -Xmx48g on an otherwise idle
  // box, with per-stage GC sums >160 s). When a big heap is requested,
  // commit and touch it up front so steady-state timing is real; the
  // one-time startup cost lands outside every timed region.
  sys.env.get("SPARK_DRIVER_MEM").toSeq.flatMap(m =>
    Seq(s"-Xms$m", "-XX:+AlwaysPreTouch"))
}
