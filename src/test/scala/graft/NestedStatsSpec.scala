package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file min/max stats for NESTED leaves (struct fields, list
  * elements, map keys/values) and file pruning on struct-path filters —
  * the reference stores stats per leaf field id and its rewrite keeps
  * them exact (test/sql/stats/min_max_nested_leaf_rewrite_corruption
  * .test, filter_pushdown.test nested cases). */
class NestedStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftnst").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.relation.location.inputFiles.length).sum

  private def mkRows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i, (i, s"n$i"), Seq(i, i + 1), Map(i -> i * 2)))
      .toDF("i", "s", "l", "m")
      .select(col("i"),
        col("s").cast("struct<a:int,b:string>").as("s"),
        col("l"), col("m"))

  test("struct-path filters prune files via per-leaf min/max stats") {
    val lake = freshLake()
    lake.createTableAs("t", mkRows(1, 51).coalesce(1))
    lake.append("t", mkRows(51, 101).coalesce(1)) // file B: s.a ∈ [51,100]
    assert(lake.listFiles("t").count() == 2)

    val low = lake.table("t", Some(col("s").getField("a") < 51))
    assert(low.count() == 50)
    assert(scannedFiles(low) == 1, "s.a < 51 must scan only file A")

    val point = lake.table("t", Some(col("s").getField("a") === 75))
    assert(point.count() == 1)
    assert(scannedFiles(point) == 1, "s.a = 75 must scan only file B")

    // files predating the stats (or lacking leaf stats) are never pruned:
    // the filter still applies row-side, so results stay exact
    val none = lake.table("t", Some(col("s").getField("a") === 1000))
    assert(none.count() == 0)
  }

  test("leaf stats survive delete + rewrite_data_files " +
      "(min_max_nested_leaf_rewrite_corruption.test)") {
    val lake = freshLake()
    lake.createTableAs("t", mkRows(1, 51).coalesce(1)) // file A (no deletes)
    lake.append("t", mkRows(51, 101).coalesce(1)) // file B (gets a delete)
    lake.delete("t", col("i") === 75)
    lake.rewriteDataFiles("t", deleteThreshold = 0.0)
    // file A untouched, file B rewritten; struct-path queries stay exact
    assert(lake.table("t", Some(col("s").getField("a") < 51)).count() == 50)
    assert(lake.table("t", Some(col("s").getField("a") === 10)).count() == 1)
    assert(lake.table("t", Some(col("s").getField("a") === 75)).count() == 0)
    // the rewritten file carries fresh leaf stats: high-range point
    // lookups scan one file
    val p = lake.table("t", Some(col("s").getField("a") === 90))
    assert(p.count() == 1 && scannedFiles(p) == 1)
  }

  test("compaction keeps nested-leaf stats prunable") {
    val lake = freshLake()
    lake.createTableAs("t", mkRows(1, 51).coalesce(1))
    lake.append("t", mkRows(51, 101).coalesce(1))
    lake.mergeAdjacentFiles("t")
    assert(lake.listFiles("t").count() == 1)
    assert(lake.table("t", Some(col("s").getField("a") === 42)).count() == 1)
    // a fresh narrow file after compaction prunes against the merged one
    lake.append("t", mkRows(1000, 1010).coalesce(1))
    val hi = lake.table("t", Some(col("s").getField("a") >= 1000))
    assert(hi.count() == 10)
    assert(scannedFiles(hi) == 1,
      "post-compaction leaf stats must prune the merged file")
  }

  test("SQL dotted paths prune too (filter_pushdown nested shape)") {
    val lake = freshLake()
    lake.createTableAs("t", mkRows(1, 51).coalesce(1))
    lake.append("t", mkRows(51, 101).coalesce(1))
    assert(lake.sql("SELECT COUNT(*) AS n FROM t WHERE s.a < 51")
      .head().getLong(0) == 50L)
    assert(lake.sql("SELECT COUNT(*) AS n FROM t WHERE s.a = 75")
      .head().getLong(0) == 1L)
  }
}
