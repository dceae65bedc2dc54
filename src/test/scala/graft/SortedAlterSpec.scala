package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Sort-spec × schema-evolution interplay (reference sorted_table family:
  * drop_sorted_column.test, merge_adjacent_sorted_renamed.test,
  * merge_adjacent_sorted_case_insensitivity.test,
  * set_default_preserves_sort_key.test). */
class SortedAlterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftsorted").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  test("cannot drop a sort-key column; RESET SORTED BY unblocks it") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType))))
    lake.setSortedBy("t", Seq(("b", "asc")))
    val e = intercept[IllegalArgumentException] {
      lake.dropColumn("t", "b")
    }
    assert(e.getMessage.contains("sorted by this column"))
    lake.resetSortedBy("t")
    lake.dropColumn("t", "b")
    assert(lake.table("t").columns.toSeq == Seq("a"))
  }

  test("rename of sort-key columns rewrites the sort expressions") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(
      StructField("unique_id", LongType), StructField("k1", LongType),
      StructField("k2", StringType))))
    lake.setSortedBy("t", Seq(("k1", "asc"), ("k2", "asc")))
    lake.renameColumn("t", "k1", "k1_changed")
    lake.renameColumn("t", "k2", "k2_changed")
    // insert succeeds because sort expressions were updated during rename
    lake.append("t", (0L until 4L).map(i =>
      (i, i % 2, s"woot$i")).toDF("unique_id", "k1_changed", "k2_changed")
      .coalesce(1))
    lake.append("t", (4L until 8L).map(i =>
      (i, i % 2, s"woot$i")).toDF("unique_id", "k1_changed", "k2_changed")
      .coalesce(1))
    // compaction re-sorts using the renamed keys
    lake.mergeAdjacentFiles("t")
    assert(lake.listFiles("t").count() == 1)
    assert(lake.table("t").count() == 8)
    // the merged file really is sorted by (k1_changed, k2_changed)
    val rows = spark.read.parquet(
      lake.listFiles("t").select("data_file").as[String].collect()
        .map(p => s"${lake.dataPath}/$p"): _*)
      .select("k1_changed", "k2_changed").collect()
      .map(r0 => (r0.getLong(0), r0.getString(1)))
    assert(rows.toSeq == rows.toSeq.sorted)
  }

  test("sort-key match is case-insensitive for drop guard and rename") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(
      StructField("a", IntegerType), StructField("B", IntegerType))))
    lake.setSortedBy("t", Seq(("b", "asc"))) // lower-case spelling
    val e = intercept[IllegalArgumentException] {
      lake.dropColumn("t", "B")
    }
    assert(e.getMessage.contains("sorted by this column"))
  }

  test("SET SORTED BY inside a transaction: ROLLBACK leaves no sort " +
      "info and no snapshot (set_sorted_by_rollback_basic.test)") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))
    val before = lake.currentSnapshotId()
    lake.begin()
    lake.setSortedBy("t", Seq(("a", "asc")))
    lake.setSortedBy("t", Seq(("b", "desc"))) // re-SET inside the txn
    lake.rollback()
    assert(lake.currentSnapshotId() == before)
    assert(lake.meta.currentSortSpec(
      lake.meta.tableByName("t", before).get.tableId, before).isEmpty)
  }

  test("SET SORTED BY + insert in one transaction: the txn's own insert " +
      "sorts, ONE commit snapshot (insert_sorted_transaction.test)") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.setSortedBy("t", Seq(("a", "asc")))
      lake.append("t", Seq((3, "c"), (1, "a"), (2, "b")).toDF("a", "b")
        .coalesce(1))
    }
    assert(lake.currentSnapshotId() == before + 1)
    // the committed file is physically sorted by a
    val rows = spark.read.parquet(
      lake.listFiles("t").select("data_file").as[String].collect()
        .map(p => s"${lake.dataPath}/$p"): _*)
      .select("a").as[Int].collect().toSeq
    assert(rows == Seq(1, 2, 3))
    // and the spec is live for later writers
    val tid = lake.meta.tableByName("t", before + 1).get.tableId
    assert(lake.meta.currentSortSpec(tid, before + 1).nonEmpty)
  }

  test("flush of inlined data writes in sort order " +
      "(data_inlining_flush_sorted_basic.test)") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))
    lake.setOption("data_inlining_row_limit", "10", Some("t"))
    lake.append("t", Seq((5, "e"), (2, "b"), (9, "i")).toDF("a", "b"))
    lake.setSortedBy("t", Seq(("a", "asc")))
    assert(lake.flushInlinedData("t") == 3L)
    val rows = spark.read.parquet(
      lake.listFiles("t").select("data_file").as[String].collect()
        .map(p => s"${lake.dataPath}/$p"): _*)
      .select("a").as[Int].collect().toSeq
    assert(rows == Seq(2, 5, 9))
    // flushed rowids stay stable through the re-sort
    assert(lake.tableWithRowId("t").select("rowid").distinct().count() == 3)
  }

  test("SET DEFAULT and unrelated rename preserve the sort key") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType))))
    lake.append("t", Seq((3, 30), (1, 10)).toDF("a", "b").coalesce(1))
    lake.setSortedBy("t", Seq(("a", "asc")))
    lake.setColumnDefault("t", "b", "42")
    lake.renameColumn("t", "a", "a_renamed")
    lake.append("t", Seq((2, 20)).toDF("a_renamed", "b").coalesce(1))
    assert(lake.table("t").orderBy("a_renamed")
      .select("a_renamed", "b").as[(Int, Int)].collect().toSeq ==
      Seq((1, 10), (2, 20), (3, 30)))
  }
}
