ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "endtoenddataengineeringprojectwithdatabricksspark"
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
) ++ sys.env.get("GRAFT_EXTRA_JAVA_OPTS").map(_.split(" ").toSeq).getOrElse(Seq.empty)

// The suite is latency-bound, not throughput-bound: one forked JVM ran
// every suite sequentially on a shared local[8] session (~28 min wall)
// while the box idled. The four long-runner suites (the three
// DeltaLiteModelWalks shards and DeltaLiteCheckpointSpec — each a chain
// of hundreds of tiny commits) get their OWN forked JVM and run in
// parallel with the main group; every other suite stays together in one
// JVM, preserving the shared-session economics AND the existing
// serialization of suites that touch shared fixed paths (MarginMining /
// EntryContract's index+catalog dirs). Isolation between groups is by
// process, so nothing about test semantics changes — only the schedule.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value
  val forkOpts = ForkOptions().withRunJVMOptions(opts.toVector)
  val solo = Set(
    "graft.DeltaLiteModelSpec",
    "graft.DeltaLiteModelWalksBSpec",
    "graft.DeltaLiteModelWalksCSpec",
    "graft.DeltaLiteCheckpointSpec",
    "graft.CrossProcessOccSpec",
    "graft.CurationSpec",
    // next tier of long runners, audited free of shared fixed paths /
    // session-catalog names (suites that DO share them — EntryContract,
    // MarginMining, GraftCatalog, DeltaSource — stay serialized in main)
    "graft.StreamingSpec",
    "graft.PlanAuditSpec",
    "graft.DeltaLiteMaintenanceDfSpec",
    "graft.DeltaLiteSidecarSpec")
  val (lone, rest) = tests.partition(t => solo(t.name))
  lone.map(t => Tests.Group(t.name, Seq(t), Tests.SubProcess(forkOpts))) :+
    Tests.Group("main", rest, Tests.SubProcess(forkOpts))
}
// allow several forked test JVMs to actually run concurrently (each a
// local[8] session on the 32-core box; 4 concurrent keeps CPU sane)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(8))
