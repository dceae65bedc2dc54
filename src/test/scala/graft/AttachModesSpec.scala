package graft

import java.nio.file.Files

import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

/** ATTACH parameters: READ_ONLY and SNAPSHOT_VERSION (reference
  * general/ducklake_read_only.test + general/attach_at_snapshot.test). */
class AttachModesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("read-only attach rejects every write, allows reads") {
    val dir = Files.createTempDirectory("graftro").toString
    // read-only attach of a non-existent catalog fails
    intercept[IllegalArgumentException] {
      Lake.attach(spark, s"$dir/nope", s"$dir/data",
        readOnly = true, snapshotVersion = None)
    }
    val rw = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    rw.createTableAs("t", Seq(1, 2).toDF("i"))
    val ro = Lake.attach(spark, s"$dir/cat", s"$dir/data",
      readOnly = true, snapshotVersion = None)
    assert(ro.table("t").count() == 2)
    val e = intercept[UnsupportedOperationException] {
      ro.append("t", Seq(3).toDF("i"))
    }
    assert(e.getMessage.contains("read-only"))
    intercept[UnsupportedOperationException](ro.delete("t",
      org.apache.spark.sql.functions.col("i") === 1))
    intercept[UnsupportedOperationException](
      ro.setOption("data_inlining_row_limit", "5"))
  }

  test("data path containing key=value segments does not hive-infer " +
    "(reference issue_1027)") {
    val dir = Files.createTempDirectory("graft1027").toString
    // incidental key=value segment in the data path itself
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/site_id=42")
    lake.createTableAs("t", (0L until 1000L).toDF("id"))
    lake.delete("t", org.apache.spark.sql.functions.col("id") % 7 === 0)
    lake.delete("t", org.apache.spark.sql.functions.col("id") % 5 === 0)
    val df = lake.table("t")
    assert(df.columns.toSeq == Seq("id"),
      s"no hive-inferred columns may leak: ${df.columns.mkString(",")}")
    assert(df.count() == 686)
    assert(df.filter(org.apache.spark.sql.functions.col("id") % 7 === 0 ||
      org.apache.spark.sql.functions.col("id") % 5 === 0).count() == 0)
  }

  test("attach at snapshot pins reads and implies read-only") {
    val dir = Files.createTempDirectory("graftpin").toString
    val rw = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    rw.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType))))
    rw.append("t", Seq(1, 2).toDF("i"))
    // pin BEFORE the insert: snapshot 1 = just-created empty table
    val pinned = Lake.attach(spark, s"$dir/cat", s"$dir/data",
      readOnly = false, snapshotVersion = Some(1L))
    assert(pinned.table("t").count() == 0)
    assert(pinned.currentSnapshotId() == 1L)
    val e = intercept[UnsupportedOperationException] {
      pinned.append("t", Seq(9).toDF("i"))
    }
    assert(e.getMessage.contains("read-only"))
    // the un-pinned attach still sees latest
    assert(rw.table("t").count() == 2)
    // missing snapshot → reference error text
    val miss = intercept[IllegalArgumentException] {
      Lake.attach(spark, s"$dir/cat", s"$dir/data",
        readOnly = false, snapshotVersion = Some(33L))
    }
    assert(miss.getMessage.contains("No snapshot found at version 33"))
  }
}
