package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.catalog._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-debt cleanup on expire_snapshots (reference
  * expire_snapshots_metadata_cleanup.test): once every snapshot that
  * could see a dropped table/column/view/macro/spec is expired, the
  * catalog rows purge — a long-lived catalog does not accrete every
  * entity ever dropped. */
class MetadataCleanupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def count(url: String, table: String): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        s"SELECT COUNT(*) FROM $table")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("expire purges catalog rows of fully-dropped entities") {
    val dir = Files.createTempDirectory("graftmeta").toString
    val lake = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    lake.createTable("tbl", StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType))))
    lake.append("tbl", Seq((1, "a")).toDF("i", "s").coalesce(1))
    lake.append("tbl", Seq((2, "b")).toDF("i", "s").coalesce(1))
    lake.addColumn("tbl", StructField("j", IntegerType), Some("0"))
    lake.setSortedBy("tbl", Seq(("i", "asc")))
    lake.setPartitionedBy("tbl", Seq(("i", "identity")))
    lake.createView("v", "SELECT i FROM tbl")
    lake.createMacro("m", Seq("x"), "x + 1")
    val url = lake.meta.jdbcUrl
    assert(count(url, "ducklake_table") > 0)
    assert(count(url, "ducklake_view") > 0)
    // drop everything, then expire all but the latest snapshot
    lake.dropView("v")
    lake.dropMacro("m", isTable = false, ifExists = false)
    lake.dropTable("tbl")
    lake.expireSnapshots(Some(System.currentTimeMillis() + 1000000))
    lake.cleanupOldFiles()
    for (t <- Seq("ducklake_table", "ducklake_column", "ducklake_view",
      "ducklake_macro", "ducklake_macro_impl", "ducklake_macro_parameters",
      "ducklake_sort_info", "ducklake_sort_expression",
      "ducklake_partition_info", "ducklake_partition_column",
      "ducklake_data_file", "ducklake_delete_file",
      "ducklake_file_column_stats", "ducklake_table_stats",
      "ducklake_table_column_stats"))
      assert(count(url, t) == 0, s"$t should be empty after expire")
  }

  test("expire keeps metadata reachable from live snapshots") {
    val dir = Files.createTempDirectory("graftmeta2").toString
    val lake = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    lake.createTableAs("t", Seq(1, 2, 3).toDF("a").coalesce(1))
    lake.renameColumn("t", "a", "b")
    val url = lake.meta.jdbcUrl
    // two column rows: closed [create, rename) and live [rename, ∞)
    assert(count(url, "ducklake_column") == 2)
    // expire the pre-rename snapshots: the closed column row must STAY —
    // the pre-rename file still resolves its columns through the epoch
    // mapping at its own begin_snapshot — and the table reads fine
    lake.expireSnapshots(Some(System.currentTimeMillis() + 1000000))
    assert(count(url, "ducklake_column") == 2)
    assert(count(url, "ducklake_table") == 1)
    assert(lake.table("t").select("b").as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3))
    // …and once the table is dropped and its last snapshot expires, the
    // column rows go too
    lake.dropTable("t")
    lake.expireSnapshots(Some(System.currentTimeMillis() + 1000000))
    assert(count(url, "ducklake_column") == 0)
    assert(count(url, "ducklake_table") == 0)
  }

  test("expiring snapshots around a rename keeps the renamed table's " +
      "files (reference expire_snapshot_bug.test)") {
    val dir = Files.createTempDirectory("graftmeta3").toString
    val lake = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    lake.createTableAs("a", Seq(0).toDF("i").coalesce(1))
    lake.renameTable("a", "b")
    val renameSnap = lake.currentSnapshotId()
    lake.append("b", Seq(1).toDF("i").coalesce(1))
    // expire everything before the rename, then the rename snapshot
    // itself; the files must survive (they belong to the LIVE table by
    // table_id — the bug deleted them because the old NAME looked dead)
    lake.expireSnapshots(versions = (0L until renameSnap))
    lake.cleanupOldFiles(Some(System.currentTimeMillis() + 1000000))
    assert(lake.table("b").orderBy("i").as[Int].collect().toSeq == Seq(0, 1))
    lake.expireSnapshots(versions = Seq(renameSnap))
    lake.cleanupOldFiles(Some(System.currentTimeMillis() + 1000000))
    assert(lake.table("b").orderBy("i").as[Int].collect().toSeq == Seq(0, 1))
    // rename again and expire everything before the second rename
    lake.renameTable("b", "c")
    val rename2 = lake.currentSnapshotId()
    lake.expireSnapshots(versions = (0L until rename2))
    lake.cleanupOldFiles(Some(System.currentTimeMillis() + 1000000))
    assert(lake.table("c").orderBy("i").as[Int].collect().toSeq == Seq(0, 1))
  }

  test("orphan sweep spares historical files; finds partition-dir orphans") {
    val dir = Files.createTempDirectory("graftorph").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTable("t", StructType(Seq(
      StructField("id", IntegerType), StructField("g", IntegerType))))
    lake.append("t", Seq((1, 0), (2, 0)).toDF("id", "g").coalesce(1))
    lake.append("t", Seq((3, 1), (4, 1)).toDF("id", "g").coalesce(1))
    val preCompact = lake.currentSnapshotId()
    // compaction ends the small files in the catalog but time travel
    // still reads them — the orphan sweep must NOT treat them as orphans
    // (known set = ALL catalog rows, reference GetKnownFilesForCleanupQuery)
    lake.mergeAdjacentFiles("t", 512L * 1024 * 1024)
    assert(lake.deleteOrphanedFiles("t", dryRun = true).isEmpty)
    assert(lake.tableAtVersion("t", preCompact).count() == 4)
    lake.deleteOrphanedFiles("t")
    assert(lake.tableAtVersion("t", preCompact).count() == 4)
    assert(lake.table("t").count() == 4)
    // partitioned table: an orphan parquet dropped into a hive SUBDIR is
    // found by the recursive sweep; the live partitioned files are kept
    val pdf = Seq((1, 0), (2, 1)).toDF("id", "g")
    lake.createTable("p", StructType(Seq(
      StructField("id", IntegerType), StructField("g", IntegerType))))
    lake.setPartitionedBy("p", Seq(("g", "identity")))
    lake.append("p", pdf)
    val pdir = java.nio.file.Paths.get(s"$dir/data/p")
    val sub = java.nio.file.Files.list(pdir).filter(Files.isDirectory(_))
      .findFirst().get()
    java.nio.file.Files.write(sub.resolve("stray.parquet"),
      Array[Byte](1, 2, 3))
    val found = lake.deleteOrphanedFiles("p")
    assert(found.size == 1 && found.head.endsWith("stray.parquet"))
    assert(lake.table("p").count() == 2)
    assert(lake.deleteOrphanedFiles("p", dryRun = true).isEmpty)
  }

  test("active files are not orphans after expire (reference " +
      "orphan_after_expire.test sequence)") {
    val dir = Files.createTempDirectory("graftoae").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.setOption("data_inlining_row_limit", "10")
    lake.sql("CREATE TABLE t1 (id INTEGER, val VARCHAR)")
    lake.sql("INSERT INTO t1 VALUES (1, 'Hello'), (2, 'World')")
    lake.flushInlinedData("t1")
    lake.sql("CREATE TABLE t2 (id INTEGER, val VARCHAR)")
    lake.sql("INSERT INTO t2 VALUES (1, 'Foo'), (2, 'Bar')")
    lake.flushInlinedData("t2")
    lake.sql("UPDATE t1 SET val = 'DuckLake' WHERE id = 2")
    lake.sql("ALTER TABLE t1 ADD COLUMN name VARCHAR")
    lake.sql("INSERT INTO t1 VALUES (3, 'Test', 'Test')")
    lake.flushInlinedData("t1")
    lake.mergeAdjacentFiles("t1", 512L * 1024 * 1024)
    lake.rewriteDataFiles("t1", 0.0)
    lake.expireSnapshots(Some(System.currentTimeMillis() + 1000))
    // every file still serving the live snapshot must NOT be an orphan
    // (expired files sit in scheduled_for_deletion, also not orphans)
    assert(lake.deleteOrphanedFiles("t1", dryRun = true).isEmpty)
    assert(lake.deleteOrphanedFiles("t2", dryRun = true).isEmpty)
    assert(lake.table("t1").orderBy("id").collect().map(r =>
      (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "Hello"), (2, "DuckLake"), (3, "Test")))
    assert(lake.table("t2").count() == 2)
    // physical cleanup of the expired files leaves live reads intact
    lake.cleanupOldFiles(Some(System.currentTimeMillis() + 1000))
    assert(lake.deleteOrphanedFiles("t1", dryRun = true).isEmpty)
    assert(lake.table("t1").count() == 3)
  }
}
