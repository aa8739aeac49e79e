ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "batchdatapipelineexercisespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// PersistBalanceSpec asserts GLOBAL SparkContext cache state (zero
// cached blocks after clearCache/releaseLeases) — under sbt's default
// parallel suite execution any concurrently-running suite's persists
// race those assertions (observed as a run-order-dependent failure
// once the suite count grew). Give it its own forked JVM; everything
// else keeps sharing one JVM/session as before.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  val (iso, rest) = tests.partition(_.name == "graft.PersistBalanceSpec")
  Seq(
    Tests.Group("persist-balance-isolated", iso, Tests.SubProcess(opts)),
    Tests.Group("shared-session", rest, Tests.SubProcess(opts)))
}
run / fork := true
// Forked `run` output must reach stdout RAW (no sbt `[info]` prefix) —
// the driver parses graft.Bench's JSON line from stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Default matches the config every BASELINE.md number was measured at —
  // the committed default IS the bench config (round-2 verdict: an unset
  // SPARK_DRIVER_MEM ran the 29-query bench at 8g and GC/eviction
  // pressure tripled the total).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Dozens of codegen-heavy queries in one JVM overflow the default
  // 240m reserved code cache; eviction then de-optimizes hot loops
  // (measured 6x slowdown on the minhash query mid-bench).
  "-XX:ReservedCodeCacheSize=1g",
)
