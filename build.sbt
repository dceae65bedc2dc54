ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ducklakespark"
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

// ---------------------------------------------------------------------------
// Parallel forked test groups. The full suite is ~55 min in ONE forked JVM
// (measured 2026-08-18, 728 tests); a run that long is exposure to any
// external wall-clock kill — the r13 driver run died mid-suite with the
// executor-teardown signature of a SIGTERM'd JVM (shutdown hook stopping the
// SparkContext while a test's job ran). Splitting the suites across N forked
// JVMs that run CONCURRENTLY cuts the wall to roughly max-bin ≈ 55/N min
// without touching a single test: each group JVM owns its own SparkContext
// (no cross-group shared state — every suite already allocates its own temp
// dirs and dynamic ports), and suites within a group still run sequentially
// (testForkedParallel stays false), so per-suite semantics are unchanged.
// GRAFT_TEST_GROUPS=1 restores the old single-JVM run.
//
// Weights = measured per-suite seconds from the 2026-08-18 full run (-oD);
// unknown suites default to 5 s. Greedy LPT packing keeps bins balanced.
val testGroupWeights: Map[String, Int] = Map(
  "graft.PgTransactionSpec" -> 425, "graft.RelationalQueriesSpec" -> 315,
  "graft.IncrementalViewSpec" -> 258, "graft.PostgresCatalogSpec" -> 257,
  "graft.SpjRandomizedSpec" -> 240, "graft.SqliteTransactionSpec" -> 208,
  "graft.RandomizedDmlSpec" -> 108, "graft.MultiProcessSpec" -> 101,
  "graft.LakeSpec" -> 100, "graft.TransactionSpec" -> 97,
  "graft.PinnedReaderSpec" -> 89, "graft.SqlSurfaceSpec" -> 76,
  "graft.ConcurrencySpec" -> 73, "graft.HttpCatalogSpec" -> 60,
  "graft.DeletionVectorSpec" -> 59, "graft.SpjScanSpec" -> 57,
  "graft.DedupSpec" -> 53, "graft.SqliteCatalogSpec" -> 50,
  "graft.BackendParitySpec" -> 42, "graft.DeletionInliningSpec" -> 41,
  "graft.PartitioningSpec" -> 34, "graft.GraftExtensionsSpec" -> 32,
  "graft.ReferenceIssuesSpec" -> 32, "graft.InliningSpec" -> 32,
  "graft.ScanPlanSpec" -> 28,
)
val nTestGroups = sys.env.getOrElse("GRAFT_TEST_GROUPS", "6").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value
    .sortBy(t => (-testGroupWeights.getOrElse(t.name, 5), t.name))
  val base = (Test / javaOptions).value.toVector
  val buckets = Array.fill(nTestGroups)(
    scala.collection.mutable.ListBuffer.empty[TestDefinition])
  val load = Array.fill(nTestGroups)(0L)
  tests.foreach { t =>
    val i = load.indexOf(load.min)
    buckets(i) += t
    load(i) += testGroupWeights.getOrElse(t.name, 5)
  }
  buckets.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    Tests.Group(
      s"group$i",
      ts.toVector,
      // per-group Derby log so concurrent engines don't interleave one file
      Tests.SubProcess(ForkOptions().withRunJVMOptions(
        base :+ s"-Dderby.stream.error.file=/tmp/graft-derby-group$i.log")))
  }.toSeq
}
// sbt's default limit is ONE forked test JVM at a time — raise it so the
// groups actually overlap. limitAll bounds total concurrent sbt tasks.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, nTestGroups),
  Tags.limitAll(math.max(nTestGroups + 2, 8)))
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
  // the bench holds every prepared plan + broadcast hash table for three
  // blocks (sf0.1, sf1, lake) at once; 8g left the sf1 block GC-bound
  // (in-suite rows ran ~25% over the same plans standalone). The host has
  // 128 GiB; 32g is a cap, not a reservation.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
