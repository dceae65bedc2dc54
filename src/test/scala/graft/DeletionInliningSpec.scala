package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion inlining (reference test/sql/deletion_inlining/): deletes at
  * or under data_inlining_row_limit live as catalog rows, accumulate,
  * get absorbed by later delete FILES, flush on demand, time-travel, and
  * surface through CDC. */
class DeletionInliningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftdinl").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  /** data files that carry at least one delete file */
  private def deleteFileCount(lake: Lake, t: String): Long =
    lake.listFiles(t).filter(col("delete_files") =!= "").count()

  test("small delete inlines: no delete file, results and rowids exact") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTableAs("t", (0L until 50L).toDF("id").coalesce(1))
    val v1 = lake.currentSnapshotId()
    assert(lake.delete("t", col("id") < 5L) == 5)
    assert(deleteFileCount(lake, "t") == 0,
      "a 5-row delete under the limit must not write a delete file")
    assert(lake.table("t").count() == 45)
    assert(lake.table("t").agg(min(col("id"))).head().getLong(0) == 5L)
    // time travel sees the pre-delete rows
    assert(lake.tableAtVersion("t", v1).count() == 50)
    // a second small delete accumulates
    assert(lake.delete("t", col("id") === 7L) == 1)
    assert(deleteFileCount(lake, "t") == 0)
    assert(lake.table("t").count() == 44)
  }

  test("a big delete absorbs prior inlined rows into its delete file") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTableAs("t", (0L until 50L).toDF("id").coalesce(1))
    assert(lake.delete("t", col("id") < 5L) == 5)      // inlined
    assert(lake.delete("t", col("id") < 30L) == 25)    // 25 > limit → file
    assert(deleteFileCount(lake, "t") == 1)
    assert(lake.table("t").count() == 20)
    // the file contains the union: a third small delete still sees a
    // consistent view and the early positions stay deleted
    assert(lake.delete("t", col("id") === 40L) == 1)
    assert(lake.table("t").as[Long].collect().sorted.toSeq ==
      ((30L until 40L) ++ (41L until 50L)))
  }

  test("flush_inlined_deletes converts catalog rows to a delete file") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTableAs("t", (0L until 50L).toDF("id").coalesce(1))
    lake.delete("t", col("id") < 5L)
    assert(deleteFileCount(lake, "t") == 0)
    assert(lake.flushInlinedDeletes("t") == 5)
    assert(deleteFileCount(lake, "t") == 1)
    assert(lake.table("t").count() == 45)
    assert(lake.table("t").agg(min(col("id"))).head().getLong(0) == 5L)
    // idempotent: nothing left to flush
    assert(lake.flushInlinedDeletes("t") == 0)
    // record count in stats stayed consistent (counted once, at inlining)
    assert(lake.tableInfo().filter(col("table_name") === "t")
      .head().getAs[Long]("record_count") == 45L)
  }

  test("CDC table_deletions reports inlined deletes; flush does not re-report") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTableAs("t", (0L until 50L).toDF("id").coalesce(1))
    val v1 = lake.currentSnapshotId()
    lake.delete("t", col("id") < 5L) // inlined
    val v2 = lake.currentSnapshotId()
    val dels = lake.tableDeletions("t", v1, v2)
    assert(dels.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 5L))
    // flush in a later range: representation change, not a new delete
    lake.flushInlinedDeletes("t")
    val v3 = lake.currentSnapshotId()
    assert(lake.tableDeletions("t", v2, v3).count() == 0)
    // full range still reports the 5 rows once
    assert(lake.tableDeletions("t", v1, v3).count() == 5)
  }

  test("inlined-delete-vs-delete concurrency conflicts both ways") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTableAs("t", (0L until 50L).toDF("id").coalesce(1))
    val base = lake.currentSnapshotId()
    val t = lake.meta.tableByName("t", base).get
    val fid = lake.meta.filesForScan(t.tableId, base).head.file.dataFileId
    // writer A inlines a delete; writer B (based on `base`) then tries a
    // file delete against the same data file → conflict
    assert(lake.delete("t", col("id") === 1L) == 1)
    val e1 = intercept[CommitConflictException] {
      lake.meta.commitDeletes(t.tableId, base,
        Seq((fid, "t/fake.parquet", 1L, 10L)))
    }
    assert(e1.getMessage.contains("concurrent inlined delete"))
    // and the reverse: stale-based INLINED delete vs the committed one
    val e2 = intercept[CommitConflictException] {
      lake.meta.appendInlinedDeletes(t.tableId, base, Seq((fid, 2L)), 1L)
    }
    assert(e2.getMessage.contains("concurrent"))
  }

  test("compaction absorbs inlined deletes; live row count stays exact") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    lake.append("t", (0L until 50L).toDF("id").coalesce(1))
    lake.append("t", (50L until 100L).toDF("id").coalesce(1))
    assert(lake.delete("t", col("id") === 10L || col("id") === 60L) == 2)
    lake.mergeAdjacentFiles("t")
    // merged file dropped the two inlined-deleted rows for good
    assert(lake.table("t").count() == 98)
    assert(lake.flushInlinedDeletes("t") == 0, "compaction must absorb")
    assert(lake.tableInfo().filter(col("table_name") === "t")
      .head().getAs[Long]("record_count") == 98L)
    // rowids survive the merge minus the deleted ones
    assert(lake.tableWithRowId("t").select("rowid").distinct().count() == 98)
  }

  test("merge after file-based delete keeps record_count single-counted") {
    val lake = freshLake() // no inlining: regular delete files
    lake.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    lake.append("t", (0L until 50L).toDF("id").coalesce(1))
    lake.append("t", (50L until 100L).toDF("id").coalesce(1))
    assert(lake.delete("t", col("id") < 20L) == 20)
    lake.mergeAdjacentFiles("t")
    assert(lake.table("t").count() == 80)
    assert(lake.tableInfo().filter(col("table_name") === "t")
      .head().getAs[Long]("record_count") == 80L,
      "physically-dropped rows must not be subtracted twice")
  }

  test("rewrite_data_files counts inlined deletes toward the threshold") {
    val lake = freshLake()
    lake.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    // appends BEFORE the option → real parquet files (a 5-row append
    // under the limit would itself inline as catalog data rows)
    lake.append("t", (0L until 5L).toDF("id").coalesce(1))
    lake.append("t", (5L until 50L).toDF("id").coalesce(1))
    lake.setOption("data_inlining_row_limit", "10")
    // fully delete the first file via an inlined delete
    assert(lake.delete("t", col("id") < 5L) == 5)
    assert(lake.rewriteDataFiles("t") == 1) // fully-dead file dropped
    assert(lake.listFiles("t").count() == 1)
    assert(lake.table("t").count() == 45)
    assert(lake.flushInlinedDeletes("t") == 0, "drop must absorb the rows")
  }

  test("SQL CALL flush_inlined_deletes works") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTableAs("t", (0L until 50L).toDF("id").coalesce(1))
    lake.delete("t", col("id") < 3L)
    val n = lake.sql("CALL flush_inlined_deletes('t')")
      .head().getLong(0)
    assert(n == 3L)
    assert(lake.table("t").count() == 47)
  }

  test("time travel across alternating inlined and file deletes " +
    "(reference issue_1074)") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "0")
    lake.createTableAs("t", (0L until 100L).toDF("id").coalesce(1))
    val v1 = lake.currentSnapshotId()
    // inlined delete of one row
    lake.setOption("data_inlining_row_limit", "100")
    assert(lake.delete("t", col("id") === 0L) == 1)
    val v2 = lake.currentSnapshotId()
    // back to delete FILES: each absorbs what came before
    lake.setOption("data_inlining_row_limit", "0")
    assert(lake.delete("t", col("id") === 1L) == 1)
    val v3 = lake.currentSnapshotId()
    assert(lake.delete("t", col("id") === 2L) == 1)
    val v4 = lake.currentSnapshotId()
    // every version's scan AND catalog fast count agree with history
    val expect = Seq(v1 -> 100L, v2 -> 99L, v3 -> 98L, v4 -> 97L)
    for ((v, n) <- expect) {
      assert(lake.tableAtVersion("t", v).count() == n, s"scan at $v")
      assert(lake.fastCount("t", version = Some(v)).contains(n),
        s"fast count at $v")
    }
    assert(lake.tableAtVersion("t", v4).agg(min(col("id")))
      .head().getLong(0) == 3L)
  }

  test("UPDATE over a file with BOTH a delete file and inlined deletes " +
    "(reference issue_865)") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTableAs("t",
      (0L until 100L).map(i => (i, "original")).toDF("id", "val")
        .coalesce(1))
    // 20-row delete → over the limit → a delete FILE
    assert(lake.delete("t", col("id") >= 80L) == 20)
    assert(deleteFileCount(lake, "t") == 1)
    assert(lake.table("t").count() == 80)
    // 5-row delete → under the limit → INLINED deletions, same data file
    assert(lake.delete("t", col("id") >= 75L) == 5)
    assert(lake.table("t").count() == 75)
    // UPDATE everything left: each surviving row exactly once, updated
    assert(lake.update("t", Map("val" -> lit("updated")),
      col("id") >= 0L) == 75)
    assert(lake.table("t").count() == 75,
      "update over delete-file + inlined-delete must not duplicate rows")
    assert(lake.table("t").filter(col("val") === "updated").count() == 75)
    assert(lake.table("t").select("id").distinct().count() == 75)
    assert(lake.table("t").agg(max(col("id"))).head().getLong(0) == 74L)
  }
}
