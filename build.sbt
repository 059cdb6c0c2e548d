ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lakehouse_automationspark"
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

// r14 (r13 verdict item 1): the serial single-JVM ScalaTest run
// outgrew the verify harness's test budget (measured 35:06 on 32
// cores — suites share one local[4] session, so the box idles).
// Suites share NOTHING across JVMs (each forked group builds its own
// SparkSession, tmp dirs are per-test, /root/testdata is read-only),
// so the suite now runs as SPARK_GRAFT_TEST_GROUPS (default 8)
// parallel forked JVMs, round-robin over suites sorted by name.
// SPARK_GRAFT_TEST_GROUPS=1 restores the serial run. Per-group heap
// is SPARK_GRAFT_TEST_MEM (default 8g — the pre-r13 default; tests
// run local[4] on sf0.001, never the 32-wide codec benches the 32g
// driver default exists for).
val testGroupCount =
  sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "8").toInt.max(1)
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector :+
    s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "8g")}"
  (Test / definedTests).value.sortBy(_.name).zipWithIndex
    .groupBy(_._2 % testGroupCount).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"group$i", ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// sbt's default concurrentRestrictions cap forked test groups at 1
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(testGroupCount,
    java.lang.Runtime.getRuntime.availableProcessors())))
// per-test durations in the log: the budget fix needs the data
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
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
  // default heap sized to the 128 GiB bench sandbox (r13: the 8g
  // default put the multimodal codec queries into GC storms once
  // their render/decode work ran 32-wide — q267 swung 1.7–15 s run to
  // run at 8g and settled at 1.7 s here; still overridable per env)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // a 38-query run compiles a lot of whole-stage-codegen classes;
  // the JVM default 240m code cache can fill near the end of the run
  // and silently de-optimize the tail queries to the interpreter
  "-XX:ReservedCodeCacheSize=768m",
)
