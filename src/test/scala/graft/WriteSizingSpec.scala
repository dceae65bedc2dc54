package graft

import java.nio.file.Files

import graft.catalog.Lake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** target_file_size write sizing + auto_compact (reference
  * ducklake_set_option: target_file_size, auto_compact). */
class WriteSizingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("target_file_size splits large appends into multiple files") {
    val dir = Files.createTempDirectory("graftws").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    // seed stats with a first append (bytes/row observed from it)
    lake.createTableAs("t",
      (1L to 10000L).map(i => (i, s"payload_$i")).toDF("id", "s").coalesce(1))
    val seeded = lake.listFiles("t").collect()
    assert(seeded.length == 1)
    // ~45KB for 10k rows → ask for ~8KB files on the next append
    lake.setOption("target_file_size", "8192")
    lake.append("t",
      (10001L to 20000L).map(i => (i, s"payload_$i")).toDF("id", "s")
        .coalesce(1))
    val after = lake.listFiles("t").collect()
    // the second single-partition append should have split into several
    assert(after.length >= 4, s"expected split files, got ${after.length}")
    assert(lake.table("t").count() == 20000)
  }

  test("auto_compact merges accumulated small files after append") {
    val dir = Files.createTempDirectory("graftac").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.setOption("auto_compact", "true")
    lake.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    (0 until 10).foreach(k =>
      lake.append("t", Seq(k.toLong).toDF("id").coalesce(1)))
    val files = lake.listFiles("t").collect()
    assert(files.length < 10, s"auto_compact did not run: ${files.length}")
    assert(lake.table("t").count() == 10)
    // rowids still unique after the background merge
    assert(lake.tableWithRowId("t").select("rowid").distinct().count() == 10)
  }

  test("row_group_count lands in the catalog and tracks the writer's " +
      "row-group sizing (format v1.1; reference row_group_count.test)") {
    val dir = Files.createTempDirectory("graftrgc").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t",
      (1L to 5000L).map(i => (i, s"payload_$i")).toDF("id", "s").coalesce(1))
    def counts(): Seq[Long] = {
      val c = java.sql.DriverManager.getConnection(lake.meta.jdbcUrl)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT row_group_count FROM ducklake_data_file " +
            "WHERE end_snapshot IS NULL")
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (rs.next()) out += rs.getLong(1)
        out.toSeq
      } finally c.close()
    }
    // default sizing: one row group per file
    assert(counts() == Seq(1L))
    // tiny row groups → several per file, counted from the footer
    lake.setOption("parquet_row_group_size_bytes", "16384")
    lake.append("t",
      (5001L to 10000L).map(i => (i, s"payload_$i")).toDF("id", "s")
        .coalesce(1))
    val after = counts()
    assert(after.size == 2 && after.max > 1,
      s"row_group_count not populated from footers: $after")
  }
}
