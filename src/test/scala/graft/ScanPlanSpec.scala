package graft

import java.nio.file.Files

import graft.catalog.Lake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guarantees of the scan path (SCALE.md §2): plain reads are
  * bare parquet scans; joins appear only when deletes/virtual columns
  * require them. */
class ScanPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("plain scan with no deletes has no join in the plan") {
    val dir = Files.createTempDirectory("graftsp").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", (1L to 100L).toDF("id"))
    val plan = lake.table("t").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert(plan.contains("FileScan parquet"))
    // filters still push down through the fast path
    val fplan = lake.table("t", Some(col("id") > 50L))
      .queryExecution.executedPlan.toString
    assert(fplan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,50)]"),
      s"filter not pushed:\n$fplan")
  }

  test("DataFrame-path filter reaches CATALOG file pruning") {
    // guards the Column→Expression conversion: Spark 4 Columns are node
    // trees; if extraction sees only a lazy wrapper, stats pruning
    // silently turns off and every file is scanned
    val dir = Files.createTempDirectory("graftsp4").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", (1L to 100L).toDF("id").coalesce(1))
    lake.append("t", (101L to 200L).toDF("id").coalesce(1))
    val df = lake.table("t", Some(col("id") > 150L))
    val nFiles = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.relation.location.inputFiles.length).sum
    assert(nFiles == 1, s"catalog pruning missing: scanned $nFiles files")
    assert(df.count() == 50)
    // conjunctions and equality prune too
    val df2 = lake.table("t",
      Some(col("id") >= 10L && col("id") <= 20L))
    val n2 = df2.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.relation.location.inputFiles.length).sum
    assert(n2 == 1 && df2.count() == 11)
  }

  test("year(ts) predicates prune files via the monotone rewrite") {
    val dir = Files.createTempDirectory("graftspyr").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    def rows(y0: Int, y1: Int) =
      (0 until 50).map(i => (y0 * 100L + i,
        java.sql.Timestamp.valueOf(s"$y0-0${i % 9 + 1}-1${i % 8} 12:00:00")))
        .toDF("id", "ts")
    lake.createTableAs("t", rows(1995, 1996).coalesce(1))
    lake.append("t", rows(1997, 1998).coalesce(1))
    lake.append("t", rows(1999, 2000).coalesce(1))
    def scanned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.inputFiles.length).sum
    // year(ts) >= 1999 → only the third file
    val ge = lake.table("t", Some(year(col("ts")) >= 1999))
    assert(scanned(ge) == 1, s"year>= pruning missing: ${scanned(ge)}")
    assert(ge.count() == 50)
    // year(ts) = 1997 → only the middle file
    val eq = lake.table("t", Some(year(col("ts")) === 1997))
    assert(scanned(eq) == 1)
    assert(eq.count() == 50)
    // year(ts) < 1997 → only the first file
    val lt = lake.table("t", Some(year(col("ts")) < 1997))
    assert(scanned(lt) == 1)
    assert(lt.count() == 50)
    lake.detach()
  }

  test("epoch-mapped scan (post-rename) still pushes filters to parquet") {
    val dir = Files.createTempDirectory("graftsp3").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t",
      (1L to 100L).map(i => (i, i * 2)).toDF("id", "v"))
    lake.renameColumn("t", "v", "doubled")
    val df = lake.table("t", Some(col("doubled") > 100L))
    // filter lands on the renamed projection but must reach the scan
    // under the file's ORIGINAL column name
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"mapping must stay join-free:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,100)]"),
      s"filter not pushed through the epoch projection:\n$plan")
    assert(df.count() == 50)
    // mixed epochs: post-rename appends produce a second scan branch,
    // each with its own pushdown
    lake.append("t", Seq((200L, 500L)).toDF("id", "doubled"))
    val plan2 = lake.table("t", Some(col("doubled") > 100L))
      .queryExecution.executedPlan.toString
    assert(plan2.contains("GreaterThan(v,100)") &&
      plan2.contains("GreaterThan(doubled,100)"),
      s"per-epoch pushdown missing:\n$plan2")
  }

  test("join-filter repruning scans only files covering the dim key range") {
    val dir = Files.createTempDirectory("graftsp5").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("fact",
      (1L to 100L).map(i => (i, i * 10)).toDF("k", "v").coalesce(1))
    lake.append("fact",
      (101L to 200L).map(i => (i, i * 10)).toDF("k", "v").coalesce(1))
    lake.append("fact",
      (201L to 300L).map(i => (i, i * 10)).toDF("k", "v").coalesce(1))
    val dim = Seq((120L, "a"), (180L, "b")).toDF("k", "tag")
    val fact = lake.tableJoinPruned("fact", "k", dim.select("k"))
    val nFiles = fact.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.relation.location.inputFiles.length).sum
    assert(nFiles == 1,
      s"dim range [120,180] must prune to the middle file, scanned $nFiles")
    // the join over the pruned scan is exact
    val joined = fact.join(broadcast(dim), "k")
    assert(joined.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("tag"))).toSet ==
      Set((120L, "a"), (180L, "b")))
    // empty dim side → empty scan, no files read
    val empty = lake.tableJoinPruned("fact", "k",
      dim.select("k").filter(lit(false)))
    assert(empty.count() == 0)
  }

  test("IN-list predicates prune files via the [min,max] envelope") {
    val dir = Files.createTempDirectory("graftsp6").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", (1L to 100L).toDF("id").coalesce(1))
    lake.append("t", (101L to 200L).toDF("id").coalesce(1))
    lake.append("t", (201L to 300L).toDF("id").coalesce(1))
    val df = lake.table("t", Some(col("id").isin(110L, 150L, 190L)))
    val nFiles = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.relation.location.inputFiles.length).sum
    assert(nFiles == 1, s"IN envelope [110,190] must prune to 1 file, got $nFiles")
    assert(df.collect().map(_.getLong(0)).toSet == Set(110L, 150L, 190L))

    // OR disjunctions on one column prune via the union envelope
    def scanned(f: org.apache.spark.sql.Column): Int =
      lake.table("t", Some(f)).queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.inputFiles.length).sum
    assert(scanned(col("id") === 110L || col("id") === 190L) == 1)
    assert(scanned((col("id") >= 105L && col("id") <= 120L) ||
      col("id") === 180L) == 1)
    // different columns (or unbounded unions) keep the full list — the
    // envelope only ever SHRINKS correct scans
    val or2 = lake.table("t",
      Some(col("id") === 110L || col("id") === 290L))
    assert(or2.collect().map(_.getLong(0)).toSet == Set(110L, 290L))
  }

  test("IS NULL scans only files whose stats admit nulls") {
    val dir = Files.createTempDirectory("graftsp7").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    def part(ids: Range, withNulls: Boolean) =
      ids.map(_.toLong).toDF("id").select(col("id"),
        (if (withNulls) when(col("id") % 10 === 0, col("id"))
         else col("id")).as("v")).coalesce(1)
    lake.createTableAs("t", part(1 to 100, withNulls = false))
    lake.append("t", part(101 to 200, withNulls = true))
    lake.append("t", part(201 to 300, withNulls = false))
    val df = lake.table("t", Some(col("v").isNull))
    val nFiles = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.relation.location.inputFiles.length).sum
    assert(nFiles == 1, s"IS NULL must prune null-free files, got $nFiles")
    assert(df.count() == 90) // the one nullable file: ids 101-200, 10 kept
  }

  test("deletes switch the scan to the anti-join path; results correct") {
    val dir = Files.createTempDirectory("graftsp2").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", (1L to 100L).toDF("id"))
    lake.delete("t", col("id") <= 10L)
    val plan = lake.table("t").queryExecution.executedPlan.toString
    assert(plan.contains("Join"), "delete filter requires the join path")
    assert(lake.table("t").count() == 90)
  }
}
