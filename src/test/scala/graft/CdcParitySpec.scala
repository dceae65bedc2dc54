package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** table_changes parity with the reference: update classification
  * (update_preimage/update_postimage pairs keyed by preserved row ids),
  * inlined-row changes, deletion snapshots, and rewrite snapshots
  * (flush/compaction) reporting NO data changes
  * (test/sql/data_inlining/data_inlining_table_changes.test,
  * data_inlining_flush.test, ducklake_table_deletions_compacted.test). */
class CdcParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftcdc").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  private def changes(lake: Lake, t: String, s0: Long, s1: Long) =
    lake.tableChanges(t, s0, s1)
      .select(col("snapshot_id"), col("rowid"), col("change_type"),
        col("i"))
      .as[(Long, Long, String, Int)].collect().toSeq.sorted

  test("inlined insert → update ×2 → delete, change feed exact " +
      "(data_inlining_table_changes.test)") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", StructType(Seq(StructField("i", IntegerType))))
    val s1 = lake.currentSnapshotId()
    lake.append("t", Seq(0, 1, 2).toDF("i")) // s1+1: inlined insert
    lake.update("t", Map("i" -> (col("i") + 100)), lit(true)) // s1+2
    lake.update("t", Map("i" -> (col("i") + 100)), lit(true)) // s1+3
    lake.delete("t", lit(true)) // s1+4

    assert(changes(lake, "t", s1, s1 + 1) == Seq(
      (s1 + 1, 0L, "insert", 0), (s1 + 1, 1L, "insert", 1),
      (s1 + 1, 2L, "insert", 2)))
    assert(changes(lake, "t", s1 + 1, s1 + 2) == Seq(
      (s1 + 2, 0L, "update_postimage", 100),
      (s1 + 2, 0L, "update_preimage", 0),
      (s1 + 2, 1L, "update_postimage", 101),
      (s1 + 2, 1L, "update_preimage", 1),
      (s1 + 2, 2L, "update_postimage", 102),
      (s1 + 2, 2L, "update_preimage", 2)))
    assert(changes(lake, "t", s1 + 2, s1 + 3) == Seq(
      (s1 + 3, 0L, "update_postimage", 200),
      (s1 + 3, 0L, "update_preimage", 100),
      (s1 + 3, 1L, "update_postimage", 201),
      (s1 + 3, 1L, "update_preimage", 101),
      (s1 + 3, 2L, "update_postimage", 202),
      (s1 + 3, 2L, "update_preimage", 102)))
    assert(changes(lake, "t", s1 + 3, s1 + 4) == Seq(
      (s1 + 4, 0L, "delete", 200), (s1 + 4, 1L, "delete", 201),
      (s1 + 4, 2L, "delete", 202)))
    // the full window unions all of it
    assert(changes(lake, "t", s1, s1 + 4).size == 3 + 6 + 6 + 3)
  }

  test("file-backed update classifies as update pair too " +
      "(rowids preserved through the rewrite)") {
    val lake = freshLake()
    lake.createTableAs("t", Seq(0, 1, 2).toDF("i").coalesce(1))
    val s0 = lake.currentSnapshotId()
    lake.update("t", Map("i" -> (col("i") + 100)), col("i") === 1)
    assert(changes(lake, "t", s0, s0 + 1) == Seq(
      (s0 + 1, 1L, "update_postimage", 101),
      (s0 + 1, 1L, "update_preimage", 1)))
  }

  test("flush and compaction snapshots report NO data changes " +
      "(data_inlining_flush.test: {flushed_inlined})") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", StructType(Seq(StructField("i", IntegerType))))
    lake.append("t", Seq(1, 2, 3).toDF("i"))
    val sf = lake.currentSnapshotId()
    assert(lake.flushInlinedData("t") == 3L)
    assert(lake.tableChanges("t", sf, sf + 1).count() == 0)
    // compaction likewise
    lake.append("t", Seq(4).toDF("i"))
    lake.flushInlinedData("t")
    val sc = lake.currentSnapshotId()
    lake.mergeAdjacentFiles("t")
    assert(lake.currentSnapshotId() == sc + 1)
    assert(lake.tableChanges("t", sc, sc + 1).count() == 0)
    // time travel + current reads unaffected
    assert(lake.table("t").count() == 4)
  }

  test("deletion snapshot_id is the DELETING snapshot, not the row's " +
      "insert snapshot") {
    val lake = freshLake()
    lake.createTableAs("t", Seq(1, 2, 3, 4).toDF("i").coalesce(1))
    lake.delete("t", col("i") === 2) // s+1
    lake.delete("t", col("i") === 4) // s+2 (absorbs s+1's file)
    val s0 = lake.currentSnapshotId() - 2
    val d = lake.tableDeletions("t", s0, s0 + 2)
      .select(col("snapshot_id"), col("i"))
      .as[(Long, Int)].collect().toSeq.sorted
    assert(d == Seq((s0 + 1, 2), (s0 + 2, 4)))
  }
}
