package graft

import java.nio.file.Files

import graft.catalog._
import graft.plans.{GraftExtensions, LakeRegistry}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Parameterized SQL over lake tables — the Spark-native analog of the
  * reference's prepared statements against a DuckLake attach
  * (test/sql/general/prepared_statement.test; the reference marks
  * EXECUTE-over-ducklake as a known v1.3.0 gap, mode skip — here both
  * named and positional binds must WORK): plan once with placeholders,
  * bind per execution, results identical to inlined literals. */
class ParameterizedSqlSpec extends AnyFunSuite {

  test("named + positional parameter binds against a DSv2 lake table") {
    val base = SparkTestSession.spark // ensure shared context exists
    // session construction sits INSIDE the try: if it throws, the finally
    // still restores the cleared default/active session for later suites
    var lake: Lake = null
    var dir: String = null
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val spark = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.catalog.graftp",
          "graft.sources.GraftTableCatalog")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import spark.implicits._
      dir = Files.createTempDirectory("graftpsql").toString
      lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
      LakeRegistry.register("graftp", lake)
      lake.createTableAs("t",
        (1L to 100L).map(i => (i, s"v$i", i % 7L)).toDF("id", "v", "k"))

      // named parameters, two different binds of the same text
      val sqlText =
        "SELECT COUNT(*) AS n FROM graftp.t WHERE id > :lo AND k = :k"
      assert(spark.sql(sqlText, Map("lo" -> 50L, "k" -> 0L))
        .head().getLong(0) ==
        (51L to 100L).count(_ % 7 == 0))
      assert(spark.sql(sqlText, Map("lo" -> 0L, "k" -> 3L))
        .head().getLong(0) == (1L to 100L).count(_ % 7 == 3))

      // positional parameters
      val pos = spark.sql(
        "SELECT id, v FROM graftp.t WHERE id BETWEEN ? AND ? ORDER BY id",
        Array(10L, 12L)).collect()
      assert(pos.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L))

      // a parameter inside an expression + string bind
      assert(spark.sql(
        "SELECT COUNT(*) AS n FROM graftp.t WHERE v = :s OR id % :m = 1",
        Map("s" -> "v5", "m" -> 50L)).head().getLong(0) == 3L)

      // time-travel + parameters compose: bind against an AT VERSION view
      val v1 = lake.currentSnapshotId()
      lake.delete("t", org.apache.spark.sql.functions.col("id") <= 90L)
      assert(spark.sql(sqlText, Map("lo" -> 50L, "k" -> 0L))
        .head().getLong(0) == (91L to 100L).count(_ % 7 == 0))
      val atV1 = lake.tableAtVersion("t", v1)
      atV1.createOrReplaceTempView("t_at_v1")
      assert(spark.sql(
        "SELECT COUNT(*) AS n FROM t_at_v1 WHERE id > :lo",
        Map("lo" -> 50L)).head().getLong(0) == 50L)
    } finally {
      // close the embedded catalog before unregistering — leaving lakes
      // booted leaks fds across the full-suite JVM (LakeQueries.detached)
      if (lake != null) lake.detach()
      if (dir != null)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      LakeRegistry.unregister("graftp")
      // do NOT stop(): the SparkContext is shared with the other suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
