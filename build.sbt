ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "transmogrifaispark"
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
// local[32] runs driver AND all executor threads in one JVM: size the
// heap for the machine (128 GiB), not for a cluster driver. 8g caused
// constant G1 churn once the suite grew past ~50 queries (old-gen at
// 90% through the whole bench, concurrent GC stealing executor cores).
// Code cache likewise: 67 queries' generated classes overflow the
// 240 MB default and flip hot paths back to the interpreter; at 110
// queries x 3 runs even 512 MB showed end-of-suite flushing (the last
// query benched 3.5x its standalone time), hence 1 GiB — and at 144
// queries the same tail signature returned (q99, last in sort order,
// 23.8 s in-suite vs 2.5 s standalone, with 30 s compile-churn stalls),
// hence the 2 GiB ceiling.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-Xms8g",
  "-XX:ReservedCodeCacheSize=2g",
  // one ~30 s silent driver stall lands on whichever iterative query is
  // running when G1 hits an evacuation failure (observed migrating
  // between the label-propagation CC queries across bench runs; full GC
  // on a 48 g heap is tens of seconds). Spark's big broadcast/array
  // allocations are humongous at the 4-16 MB default region size —
  // 32 m regions push them back to normal allocation paths, and a
  // larger reserve absorbs promotion bursts instead of failing the
  // evacuation. GC log kept for diagnosis (per-pid, overwritten).
  "-XX:G1HeapRegionSize=32m",
  "-XX:G1ReservePercent=15",
  "-Xlog:gc:/tmp/graft_gc_%p.log",
  // deep task-closure deserialization (iterative fits under suite load)
  // overflowed the default 1 MB thread stack once; 8 MB is cheap belt
  "-Xss8m",
)
// Isolate the iterative-ML suites in their own forked JVM: a fatal error
// there (e.g. a StackOverflow inside a task deserializer beginning JVM
// shutdown) must not cascade into the other ~40 suites sharing the fork.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val heavyNames = Set(
    "graft.workflow.MLStagesSpec",
    "graft.workflow.CvCutSpec",
    "graft.workflow.MulticlassSelectorSpec",
    "graft.workflow.WorkflowSpec",
    "graft.operators.ClusteringSpec",
    "graft.operators.TextVectorizersSpec",
  )
  val (heavy, light) = tests.partition(t => heavyNames.contains(t.name))
  Seq(
    Tests.Group("ml-heavy", heavy, Tests.SubProcess(opts)),
    Tests.Group("main", light, Tests.SubProcess(opts)),
  )
}
