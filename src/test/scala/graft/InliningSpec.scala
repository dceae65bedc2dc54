package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Data inlining (reference test/sql/data_inlining/, 40 files), sort specs,
  * commit messages, and mixed materialized/raw scans. */
class InliningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftinl").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  test("small inserts inline into catalog DB; scan unions them") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    lake.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // no parquet files yet — rows live in the catalog
    assert(lake.listFiles("t").count() == 0)
    assert(lake.table("t").count() == 2)
    // big insert goes to parquet; scan unions both
    lake.append("t", (10 to 40).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(lake.listFiles("t").count() > 0)
    assert(lake.table("t").count() == 33)
    // rowids unique across inlined + file rows
    assert(lake.tableWithRowId("t").select("rowid").distinct().count() == 33)
  }

  test("delete hits inlined rows; time travel sees them") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", StructType(Seq(StructField("id", IntegerType))))
    lake.append("t", Seq(1, 2, 3).toDF("id"))
    val v1 = lake.currentSnapshotId()
    val n = lake.delete("t", col("id") === 2)
    assert(n == 1)
    assert(lake.table("t").as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(lake.tableAtVersion("t", v1).count() == 3)
  }

  test("flush_inlined_data moves rows to parquet, preserving rowids") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", StructType(Seq(StructField("id", IntegerType))))
    lake.append("t", Seq(1, 2, 3).toDF("id"))
    val ridsBefore = lake.tableWithRowId("t")
      .select("id", "rowid").as[(Int, Long)].collect().toMap
    val flushed = lake.flushInlinedData("t")
    assert(flushed == 3)
    assert(lake.listFiles("t").count() == 1)
    assert(lake.table("t").count() == 3)
    val ridsAfter = lake.tableWithRowId("t")
      .select("id", "rowid").as[(Int, Long)].collect().toMap
    assert(ridsAfter == ridsBefore)
    // flushing again is a no-op
    assert(lake.flushInlinedData("t") == 0)
  }

  test("flush inside a transaction: read-your-writes, ONE commit " +
      "snapshot, ROLLBACK removes the file (data_inlining_flush.test)") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    lake.append("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val rowids = lake.tableWithRowId("t").select("rowid")
      .as[Long].collect().sorted.toSeq

    // ROLLBACK: catalog untouched, no file survives
    val before = lake.currentSnapshotId()
    lake.begin()
    assert(lake.flushInlinedData("t") == 3L)
    assert(lake.table("t").count() == 3) // reads serve the flushed file
    assert(lake.tableWithRowId("t").select("rowid")
      .as[Long].collect().sorted.toSeq == rowids) // rowids preserved
    lake.rollback()
    assert(lake.currentSnapshotId() == before)
    assert(lake.listFiles("t").count() == 0) // rows back in the catalog
    assert(lake.table("t").count() == 3)
    assert(lake.deleteOrphanedFiles("t", dryRun = true).isEmpty)

    // COMMIT: one snapshot; rowids stable; second flush in-txn is a no-op
    lake.transaction {
      assert(lake.flushInlinedData("t") == 3L)
      assert(lake.flushInlinedData("t") == 0L)
      assert(lake.table("t").count() == 3)
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.listFiles("t").count() == 1)
    assert(lake.table("t").count() == 3)
    assert(lake.tableWithRowId("t").select("rowid")
      .as[Long].collect().sorted.toSeq == rowids)
  }

  test("flush buffered in a txn conflicts with a concurrent flush " +
      "of the same rows") {
    val dir = Files.createTempDirectory("graftinl2").toString
    val lake = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    val lake2 = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", StructType(Seq(StructField("id", IntegerType))))
    lake.append("t", Seq(1, 2).toDF("id"))
    lake.begin()
    lake.flushInlinedData("t")
    lake2.flushInlinedData("t") // second writer flushes first
    intercept[CommitConflictException](lake.commit())
    lake.rollback()
    assert(lake.table("t").count() == 2)
  }

  test("a DELETE spanning inlined and file rows commits ONE snapshot") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "5")
    lake.createTable("t", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    lake.append("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    lake.append("t", (10 to 40).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(lake.listFiles("t").count() > 0)
    val before = lake.currentSnapshotId()
    // hits inlined rows (1..3 are odd/even mix) AND file rows
    assert(lake.delete("t", col("id") % 2 === 1) == 17L)
    assert(lake.currentSnapshotId() == before + 1,
      "inlined + file victims must land in one snapshot")
    assert(lake.table("t").count() == 34 - 17)
    // time travel to just before still sees everything
    assert(lake.tableAtVersion("t", before).count() == 34)
    // the same shape through UPDATE: mixed victims rewrite in ONE snapshot
    val b2 = lake.currentSnapshotId()
    assert(lake.update("t", Map("v" -> lit("upd")),
      col("id") % 2 === 0) == 17L)
    assert(lake.currentSnapshotId() == b2 + 1)
    assert(lake.table("t").filter(col("v") === "upd").count() == 17)
  }

  test("small UPDATE stays in the catalog with row ids preserved " +
      "(data_inlining_update_inline_verification.test)") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "5")
    // 20 rows → a parquet file (above the limit)
    lake.createTableAs("t",
      (0 until 20).map(i => (i, s"val_$i")).toDF("i", "j").coalesce(1))
    assert(lake.listFiles("t").count() == 1)
    assert(lake.update("t", Map("j" -> lit("updated")), col("i") === 5) == 1)
    // still exactly one file: the rewrite lives in the catalog
    assert(lake.listFiles("t").count() == 1)
    val r = lake.tableWithRowId("t").filter(col("i") === 5)
      .select("rowid", "j").head()
    assert(r.getLong(0) == 5L && r.getString(1) == "updated")
    assert(lake.table("t").count() == 20)
    // a second update of the SAME row hits the inlined version
    assert(lake.update("t", Map("j" -> lit("changed")), col("i") === 5) == 1)
    assert(lake.listFiles("t").count() == 1)
    val r2 = lake.tableWithRowId("t").filter(col("i") === 5)
      .select("rowid", "j").head()
    assert(r2.getLong(0) == 5L && r2.getString(1) == "changed")
    assert(lake.table("t").count() == 20)
    // time travel still sees the original value
    val v0 = lake.meta.currentSnapshot().snapshotId - 2
    assert(lake.tableAtVersion("t", v0).filter(col("i") === 5)
      .select("j").as[String].head() == "val_5")
    // an update ABOVE the limit writes files as before
    assert(lake.update("t", Map("j" -> lit("bulk")), col("i") < 10) == 10)
    assert(lake.listFiles("t").count() > 1)
    assert(lake.table("t").filter(col("j") === "bulk").count() == 10)
  }

  test("insert-only MERGE below the limit inlines instead of writing " +
      "parquet (data_inlining_merge_insert_only.test)") {
    val lake = freshLake()
    lake.setOption("data_inlining_row_limit", "10")
    lake.createTable("t", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    lake.merge("t", Seq((2, "merge-insert")).toDF("id", "v"), "id")
    assert(lake.table("t").as[(Int, String)].collect().toSeq ==
      Seq((2, "merge-insert")))
    assert(lake.listFiles("t").count() == 0) // inlined, no parquet
    // a second merge matching the row routes through the delete path
    // and still nets out correctly
    lake.merge("t", Seq((2, "upd"), (3, "new")).toDF("id", "v"), "id",
      whenMatchedUpdate = Some(Map("v" -> lit("upd"))))
    assert(lake.table("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((2, "upd"), (3, "new")))
  }

  test("sort-on-insert orders rows within written files") {
    val lake = freshLake()
    lake.createTable("s", StructType(Seq(StructField("id", IntegerType))))
    lake.setSortedBy("s", Seq(("id", "desc")))
    lake.append("s", Seq(3, 1, 2).toDF("id").coalesce(1))
    val rows = lake.tableWithRowId("s")
      .orderBy("file_row_number").select("id").as[Int].collect().toSeq
    assert(rows == Seq(3, 2, 1))
  }

  test("commit message lands on the next snapshot") {
    val lake = freshLake()
    lake.createTable("m", StructType(Seq(StructField("id", IntegerType))))
    lake.setCommitMessage("tester", "hello commit")
    lake.append("m", Seq(1).toDF("id"))
    val last = lake.snapshots().orderBy(col("snapshot_id").desc).limit(1)
      .collect()(0)
    assert(last.getAs[String]("author") == "tester")
    assert(last.getAs[String]("commit_message") == "hello commit")
  }

  test("mixed scan: compacted (materialized rowid) + fresh raw files") {
    val lake = freshLake()
    lake.createTable("mx", StructType(Seq(StructField("id", LongType))))
    (0 until 3).foreach(k =>
      lake.append("mx", (k * 10L until (k + 1) * 10L).toDF("id")))
    lake.mergeAdjacentFiles("mx")
    // new raw append AFTER compaction → snapshot mixes both file kinds
    lake.append("mx", (100L to 109L).toDF("id"))
    val rows = lake.tableWithRowId("mx")
    assert(rows.count() == 40)
    assert(rows.select("rowid").distinct().count() == 40)
    assert(rows.filter(col("rowid").isNull).count() == 0)
  }
}
