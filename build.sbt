ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "connemaraspark"
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
// Forked run output passes through raw — sbt's "[info] " logger prefix
// otherwise lands in front of Bench's JSON line and breaks the
// driver-side json.loads (BENCH_r01.json recorded "parsed": null).
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
)
// Run the suite as 4 forked JVMs in parallel (opt round 16): the
// sequential single-fork run measured ~915 s of almost pure per-suite
// wall time on a 32-core box using local[4] — the suites are mutually
// independent (per-suite temp dirs, applicationId-keyed staging, no
// shared metastore), so group-level parallelism is the guide-§2.6
// "overlap independent jobs" lever applied to the test harness. Each
// group is a separate JVM with its own SparkSession, so suites that
// mutate session conf (timezone, AQE toggles) stay isolated exactly
// as they were in the single-fork run. Heavy suites (measured per-
// suite seconds in OPTIMIZATION_r16.md) are pinned to distinct
// groups; the rest deal round-robin.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  val nGroups = 4
  val pinned = Map(
    "graft.OpsSpec" -> 0,
    "graft.ApplyPropertySpec" -> 0,
    "graft.EventStreamsSpec" -> 1,
    "graft.IvfIndexSpec" -> 1,
    "graft.DocIngestSpec" -> 2,
    "graft.CdcStreamSpec" -> 2,
    "graft.PlanAuditSpec" -> 3,
    "graft.EventAnalyticsSpec" -> 3)
  val rest = tests.filterNot(t => pinned.contains(t.name))
    .sortBy(_.name).zipWithIndex
    .map { case (t, i) => t.name -> (i % nGroups) }.toMap
  tests.groupBy(t => pinned.getOrElse(t.name, rest(t.name))).toSeq
    .sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"group$g", ts, Tests.SubProcess(opts))
    }
}
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 4))
