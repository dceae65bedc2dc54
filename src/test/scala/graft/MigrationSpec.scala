package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-place metadata-format migration (reference v1.0→v1.1 discipline:
  * ducklake_metadata_manager_v1_1.cpp + test/sql/migration/): attaching a
  * catalog written by an older format upgrades its schema, bumps
  * `version`, and backfills the materialized-rowid flag from parquet
  * footers so pre-migration compacted files keep their row identity. */
class MigrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("0.3 catalog migrates to 0.4 on attach, with rowid-flag backfill") {
    val dir = Files.createTempDirectory("graftmig").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", (1L to 20L).toDF("id"))
    lake.append("t", (21L to 40L).toDF("id"))
    val ridsBefore = lake.tableWithRowId("t")
      .select("id", "rowid").as[(Long, Long)].collect().toMap
    lake.mergeAdjacentFiles("t") // merged file embeds rowid columns
    lake.append("t", (41L to 50L).toDF("id")) // raw file, no rowid cols

    // ---- regress the catalog to format 0.3 (what rounds 2/3 wrote) ----
    val c = DriverManager.getConnection(lake.meta.jdbcUrl)
    c.createStatement().executeUpdate(
      "ALTER TABLE ducklake_data_file DROP COLUMN has_row_ids RESTRICT")
    c.createStatement().executeUpdate(
      "DROP TABLE ducklake_file_variant_stats")
    c.createStatement().executeUpdate(
      "UPDATE ducklake_metadata SET mvalue = '0.3' WHERE mkey = 'version'")
    c.close()

    // ---- re-attach: migrate + backfill ----
    val lake2 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    assert(lake2.meta.getOption("version")
      .contains(MetadataManager.FormatVersion))
    // the merged file's flag was recovered from its footer; raw files stay
    // unflagged — so rowids are still the ORIGINAL ones after migration
    val t = lake2.meta.tableByName("t", lake2.currentSnapshotId()).get
    val files = lake2.meta.filesForScan(t.tableId, lake2.currentSnapshotId())
    assert(files.count(_.file.hasRowIds) == 1) // exactly the merged file
    assert(files.exists(!_.file.hasRowIds)) // post-merge appends unflagged
    val ridsAfter = lake2.tableWithRowId("t")
      .filter(col("id") <= 40L)
      .select("id", "rowid").as[(Long, Long)].collect().toMap
    assert(ridsAfter == ridsBefore)
    // migration is idempotent and the backfill marker is cleared
    assert(!lake2.meta.pendingRowIdBackfill)
    val lake3 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    assert(lake3.table("t").count() == 50)
    // the recreated variant-stats table accepts shredded writes
    lake3.createTableAs("vm", Seq((1L, """{"n":5}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("payload")))
    lake3.setOption("variant_shredded_paths", "payload:$.n:bigint",
      table = Some("vm"))
    lake3.append("vm", Seq((2L, """{"n":9}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("payload")))
    assert(lake3.table("vm").count() == 2)
  }

  test("0.5 catalog's old view_column_tag (column_id) gains column_name") {
    val dir = java.nio.file.Files.createTempDirectory("graftmig5").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("base", Seq((1, "a")).toDF("id", "v"))
    lake.createView("vw", "SELECT id FROM base")
    lake.detach()
    // rewind the catalog to the round-5 shape: version 0.5 +
    // column_id-keyed view_column_tag (never written to)
    val c = DriverManager.getConnection(s"jdbc:derby:$dir/cat")
    try {
      val st = c.createStatement()
      st.executeUpdate("DROP TABLE ducklake_view_column_tag")
      st.executeUpdate(
        """CREATE TABLE ducklake_view_column_tag (
          |  view_id BIGINT, column_id BIGINT, begin_snapshot BIGINT,
          |  end_snapshot BIGINT, tag_key VARCHAR(256),
          |  tag_value VARCHAR(4096))""".stripMargin)
      st.executeUpdate(
        "UPDATE ducklake_metadata SET mvalue = '0.5' WHERE mkey = 'version'")
      st.close()
    } finally c.close()
    // re-attach migrates; view COLUMN comments work on the upgraded shape
    val lake2 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake2.commentOnColumn("vw", "id", "upgraded")
    assert(lake2.columnComment("vw", "id").contains("upgraded"))
    lake2.detach()
  }
}
