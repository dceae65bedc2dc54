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
