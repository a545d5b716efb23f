ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "data_engineer_capstonespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// per-test durations in the log (suite balancing for the grouped runs)
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")

// r17: `sbt test` ran 9m51s single-JVM against the driver's 10-minute
// verify budget (VERDICT r16 item 8 — one more slow suite and the round
// goes UNVERIFIED for harness reasons). Suites are split across four
// forked JVMs balanced by measured duration (test_run log, -oD):
// SparkEntrySpec 230s | TxLogSpec 136 + Trend 16 + GraphOps 8 |
// PlanShape 65 + Extensions 60 + Governance 11 + Properties 7 |
// Streaming 34 + TxLogStream 23 + Lake 21 + Multimodal 11 + rest ~15.
// Cross-JVM safety: every fixture path/table name is per-JVM nonce-keyed
// (Scratch.base, graft_*_bkt_<nonce>, catalog is in-memory per session),
// so parallel groups share only the read-only testdata. Wall ≈ 4 min.
val testGroupNames: Map[Int, Set[String]] = Map(
  0 -> Set("SparkEntrySpec"),
  1 -> Set("TxLogSpec", "TrendSpec", "GraphOpsSpec"),
  2 -> Set("PlanShapeSpec", "ExtensionsSpec", "GovernanceSpec", "PropertiesSpec"))
Test / testGrouping := {
  val opts = ForkOptions()
    .withWorkingDirectory(Option(baseDirectory.value))
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
    .withOutputStrategy((Test / outputStrategy).value)
  val bySuffix = (Test / definedTests).value.groupBy { t =>
    val simple = t.name.split('.').last
    testGroupNames.collectFirst { case (g, names) if names(simple) => g }
      .getOrElse(3)
  }
  bySuffix.toSeq.sortBy(_._1).map { case (g, ts) =>
    Tests.Group(s"group$g", ts, Tests.SubProcess(opts))
  }
}
// default restriction caps forked test groups at 1 — allow all four
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(16))
run / fork := true
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
