package graft

import java.nio.file.Files

import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

/** ATTACH parameters: READ_ONLY and SNAPSHOT_VERSION (reference
  * general/ducklake_read_only.test + general/attach_at_snapshot.test). */
class AttachModesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("attach without DATA_PATH reads the stored path " +
      "(reference data_path_tag.test)") {
    val dir = Files.createTempDirectory("graftnodp").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    lake.detach()
    // re-attach with the catalog alone: data path comes from
    // ducklake_metadata
    val re = Lake.attach(spark, s"$dir/cat")
    assert(re.table("t").count() == 2)
    re.append("t", Seq((3, "c")).toDF("id", "v"))
    assert(re.table("t").count() == 3)
    // a nonexistent filesystem catalog without a data path CREATES a
    // fresh lake with the default <catalog>.files data dir (reference
    // general/default_path.test — covered in depth below)
    val fresh = Lake.attach(spark, s"$dir/nosuch")
    assert(fresh.meta.dataPath.replace('\\', '/').endsWith("nosuch.files"))
  }

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

  test("METADATA_SCHEMA: two lakes share one metadata store " +
    "(reference transaction_schema.test)") {
    val dir = Files.createTempDirectory("graftms").toString
    // SAME catalog DB, different metadata schemas, different data paths
    val l1 = Lake.attach(spark, s"$dir/cat", s"$dir/data_s1",
      metadataSchema = Some("metadata_s1"))
    val l2 = Lake.attach(spark, s"$dir/cat", s"$dir/data_s2",
      metadataSchema = Some("metadata_s2"))
    import org.apache.spark.sql.functions.lit
    l1.createTableAs("tbl", {
      import spark.implicits._; Seq(42).toDF("i")
    })
    l2.createTableAs("tbl", {
      import spark.implicits._; Seq("hello world").toDF("s")
    })
    // same table NAME, fully independent state
    assert(l1.table("tbl").head().getInt(0) == 42)
    assert(l2.table("tbl").head().getString(0) == "hello world")
    assert(l1.table("tbl").columns.toSeq == Seq("i"))
    assert(l2.table("tbl").columns.toSeq == Seq("s"))
    // snapshots advance independently
    val (v1, v2) = (l1.currentSnapshotId(), l2.currentSnapshotId())
    l1.delete("tbl", lit(true))
    assert(l1.currentSnapshotId() == v1 + 1)
    assert(l2.currentSnapshotId() == v2)
    assert(l1.table("tbl").count() == 0)
    assert(l2.table("tbl").count() == 1)
    // dropping in one store leaves the other untouched
    l2.dropTable("tbl")
    assert(l1.listFiles("tbl").count() >= 0) // still resolvable
    intercept[IllegalArgumentException](l2.table("tbl"))
    // re-attach under the same schema sees persisted state
    val l1b = Lake.attach(spark, s"$dir/cat", s"$dir/data_s1",
      metadataSchema = Some("metadata_s1"))
    assert(l1b.table("tbl").count() == 0)
  }

  test("corrupted catalog isolates: other lakes attach and work " +
    "(reference corrupted_catalog_fault_isolation)") {
    val dir = Files.createTempDirectory("graftcor").toString
    val bad = Lake.attach(spark, s"$dir/bad_cat", s"$dir/bad_data")
    bad.createTableAs("t1", {
      import org.apache.spark.sql.functions.lit
      spark.range(1).select(lit(1).as("id"), lit("hello").as("name"))
    })
    // corrupt the metadata: invalid column type, via direct JDBC
    val c = java.sql.DriverManager.getConnection(
      graft.catalog.MetadataManager.derbyUrl(s"$dir/bad_cat"))
    try {
      val st = c.createStatement()
      st.executeUpdate(
        "UPDATE ducklake_column SET column_type = 'int32varcharvarchar' " +
          "WHERE column_name = 'id'")
      st.close()
    } finally c.close()
    // a sibling lake attaches and works despite the corrupted one
    val good = Lake.attach(spark, s"$dir/good_cat", s"$dir/good_data")
    good.createTableAs("t2", {
      import org.apache.spark.sql.functions.lit
      spark.range(1).select(lit(42L).as("v"))
    })
    assert(good.table("t2").head().getLong(0) == 42L)
    // re-attach of the corrupted catalog itself succeeds (lazy binding);
    // only touching the broken table errors
    val again = Lake.attach(spark, s"$dir/bad_cat", s"$dir/bad_data")
    intercept[Exception](again.table("t1").collect())
    assert(again.listSchemas().contains("main"))
  }

  test("settings() surfaces unknown metadata keys " +
    "(reference options_unknown_metadata_key)") {
    val dir = Files.createTempDirectory("graftuk").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.setOption("mykey", "myvalue")
    lake.setOption("another_unknown", "v2")
    val rows = lake.settings().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.get("mykey").contains("myvalue"))
    assert(rows.get("another_unknown").contains("v2"))
  }

  test("detach shuts the embedded catalog down; re-attach works " +
    "(reference detach_ducklake.test)") {
    val dir = Files.createTempDirectory("graftdet").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", { import spark.implicits._
      (0L until 10L).toDF("id") })
    // an open transaction rolls back on detach
    lake.begin()
    lake.append("t", { import spark.implicits._; Seq(99L).toDF("id") })
    lake.detach()
    val back = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    assert(back.table("t").count() == 10)
    assert(back.deleteOrphanedFiles("t", dryRun = true).isEmpty)
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

  test("attach without DATA_PATH defaults to <catalog>.files beside it " +
      "(reference general/default_path.test)") {
    val dir = Files.createTempDirectory("graftdefp").toString
    val lake = Lake.attach(spark, s"$dir/cat")
    lake.createTableAs("test", Seq((1, 2), (3, 4)).toDF("i", "j"))
    assert(lake.table("test").count() == 2)
    // files landed under the default data dir, per-table subdirs
    val files = new java.io.File(s"$dir/cat.files/test")
      .listFiles((_, n) => n.endsWith(".parquet"))
    assert(files != null && files.nonEmpty)
    // re-attach with only the catalog path reads the same data
    val again = Lake.attach(spark, s"$dir/cat")
    assert(again.table("test").count() == 2)
    // a fresh JDBC catalog has no stored data_path and no filesystem
    // neighbor to default to — attach without DATA_PATH fails
    intercept[Exception](
      Lake.attach(spark, "jdbc:derby:memory:defp_missing;create=true"))
  }
}
