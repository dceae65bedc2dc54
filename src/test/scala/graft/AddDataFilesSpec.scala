package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ducklake_add_data_files options (reference
  * ducklake_add_data_files.cpp:44-69 + ducklake_name_map.cpp): foreign
  * parquet registered without rewrite, column-name mapping, missing/extra
  * column handling, hive partition inference. */
class AddDataFilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): (Lake, String) = {
    val dir = Files.createTempDirectory("graftadf").toString
    (Lake.attach(spark, s"$dir/cat", s"$dir/data"), dir)
  }

  test("name-mapped foreign file reads under its own column names") {
    val (lake, dir) = freshLake()
    lake.createTable("t", Seq((0L, "x", 0.0)).toDF("id", "v", "score").schema)
    // foreign file with different column names + an extra column
    val foreign = s"$dir/foreign1"
    Seq((1L, "a", 1.5, "junk"), (2L, "b", 2.5, "junk"))
      .toDF("fid", "fv", "fscore", "extra")
      .coalesce(1).write.parquet(foreign)
    val file = Files.list(java.nio.file.Paths.get(foreign))
      .filter(_.toString.endsWith(".parquet")).findFirst().get().toString

    intercept[IllegalArgumentException] { // unknown col without the flag
      lake.addDataFiles("t", Seq(file),
        columnMapping = Map("fid" -> "id", "fv" -> "v", "fscore" -> "score"))
    }
    lake.addDataFiles("t", Seq(file),
      columnMapping = Map("fid" -> "id", "fv" -> "v", "fscore" -> "score"),
      ignoreExtraColumns = true)
    val got = lake.table("t").orderBy("id").as[(Long, String, Double)]
      .collect().toSeq
    assert(got == Seq((1L, "a", 1.5), (2L, "b", 2.5)))
    // mixes with natively-written files in one scan
    lake.append("t", Seq((3L, "c", 3.5)).toDF("id", "v", "score"))
    assert(lake.table("t").count() == 3)
    // rowid machinery works over mapped files too
    assert(lake.tableWithRowId("t").select("rowid").distinct().count() == 3)
    // stats recorded under table column ids → pruning still works
    assert(lake.table("t", Some(col("id") === 3L)).count() == 1)
  }

  test("allowMissing: absent columns read back NULL") {
    val (lake, dir) = freshLake()
    lake.createTable("m", Seq((0L, "x", 0.0)).toDF("id", "v", "score").schema)
    val foreign = s"$dir/foreign2"
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(foreign)
    val file = Files.list(java.nio.file.Paths.get(foreign))
      .filter(_.toString.endsWith(".parquet")).findFirst().get().toString
    intercept[IllegalArgumentException] {
      lake.addDataFiles("m", Seq(file))
    }
    lake.addDataFiles("m", Seq(file), allowMissing = true)
    val r = lake.table("m").head()
    assert(r.getLong(0) == 1L && r.getString(1) == "a" && r.isNullAt(2))
  }

  test("hive partition inference feeds partition pruning") {
    val (lake, dir) = freshLake()
    lake.createTable("h", Seq((0L, "x")).toDF("id", "region").schema)
    lake.setPartitionedBy("h", Seq(("region", "identity")))
    // two hive-layout foreign files
    Seq((1L, "eu")).toDF("id", "region").coalesce(1)
      .write.parquet(s"$dir/hv/region=eu")
    Seq((2L, "us")).toDF("id", "region").coalesce(1)
      .write.parquet(s"$dir/hv/region=us")
    def fileIn(sub: String) =
      Files.walk(java.nio.file.Paths.get(s"$dir/hv/$sub"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get().toString
    lake.addDataFiles("h", Seq(fileIn("region=eu"), fileIn("region=us")),
      hivePartitions = true)
    assert(lake.table("h").count() == 2)
    assert(lake.table("h", Some(col("region") === "eu")).count() == 1)
  }

  test("add_data_files inside a transaction " +
      "(reference add_files_transaction_local / add_rollback)") {
    val (lake, dir) = freshLake()
    def writeForeign(sub: String, rows: (Long, String)*): String = {
      rows.toSeq.toDF("col1", "col2").coalesce(1)
        .write.parquet(s"$dir/$sub")
      Files.walk(java.nio.file.Paths.get(s"$dir/$sub"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get().toString
    }
    val f1 = writeForeign("for1", (1L, "hello world"))
    // CREATE TABLE + add_data_files in ONE transaction: read-your-writes,
    // one commit snapshot
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.createTable("test", Seq((0L, "x")).toDF("col1", "col2").schema)
      lake.addDataFiles("test", Seq(f1))
      assert(lake.table("test").head().getString(1) == "hello world")
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("test").head().getString(1) == "hello world")
    // rollback removes the copied file from the table dir
    val f2 = writeForeign("for2", (2L, "bye"))
    lake.begin()
    lake.addDataFiles("test", Seq(f2))
    assert(lake.table("test").count() == 2)
    lake.rollback()
    assert(lake.table("test").count() == 1)
    assert(lake.deleteOrphanedFiles("test", dryRun = true).isEmpty)
    // txn-created table + mismatched schema needs a mapping → clear error
    val f3 = writeForeign("for3", (3L, "z"))
    lake.begin()
    lake.createTable("other",
      Seq((0L, "x", 0.0)).toDF("col1", "col2", "col3").schema)
    val e = intercept[IllegalArgumentException](
      lake.addDataFiles("other", Seq(f3), allowMissing = true))
    assert(e.getMessage.contains("matching the table schema exactly"))
    lake.rollback()
  }
}
