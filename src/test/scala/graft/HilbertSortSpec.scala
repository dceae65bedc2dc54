package graft

import java.nio.file.Files

import graft.catalog._
import graft.functions.{GeoWkb, Hilbert2D}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Hilbert space-filling-curve sorting (reference
  * merge_adjacent_sorted_spatial_hilbert.test) + the SET/RESET SORTED BY
  * and SET/RESET PARTITIONED BY SQL surface. */
class HilbertSortSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("grafthil").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  test("Hilbert2D: order-preserving grid mapping and injective curve") {
    val vs = Seq(-1e9, -42.5, -1.0, -1e-9, 0.0, 1e-9, 1.0, 42.5, 1e9)
    val mapped = vs.map(Hilbert2D.gridGlobal)
    assert(mapped == mapped.sorted, s"grid mapping must preserve order: $mapped")
    // injectivity on a scattered sample of distinct cells
    val cells = for (x <- 0 until 50; y <- 0 until 50)
      yield Hilbert2D.xy2d(x * 117, y * 233)
    assert(cells.distinct.size == cells.size)
    // locality: consecutive curve positions are adjacent grid cells, so
    // points sorted by curve index cluster spatially — check that the
    // average |Δd| between 4-neighbours is far below random pairs
    val r = new scala.util.Random(7)
    def d(x: Int, y: Int) = Hilbert2D.xy2d(x, y)
    val neigh = (1 to 500).map { _ =>
      val x = r.nextInt(60000) + 1; val y = r.nextInt(60000) + 1
      math.abs(d(x, y) - d(x + 1, y)).toDouble
    }
    val rand = (1 to 500).map { _ =>
      math.abs(d(r.nextInt(60000), r.nextInt(60000)).toDouble -
        d(r.nextInt(60000), r.nextInt(60000)).toDouble)
    }
    assert(neigh.sum / neigh.size < rand.sum / rand.size / 100)
  }

  test("hilbert-sorted compaction clusters rows spatially " +
    "(reference merge_adjacent_sorted_spatial_hilbert shape)") {
    val lake = freshLake()
    lake.sql("CREATE TABLE spatial_sort_test (i BIGINT, j BIGINT)")
    lake.sql("""INSERT INTO spatial_sort_test VALUES
      (10, 100), (10, 101), (11, 100), (11, 101)""")
    lake.sql("""INSERT INTO spatial_sort_test VALUES
      (12, 102), (12, 103), (13, 102), (13, 103)""")
    assert(lake.listFiles("spatial_sort_test").count() >= 2)
    lake.sql("ALTER TABLE spatial_sort_test SET SORTED BY " +
      "(st_hilbert(st_point(i, j)) ASC NULLS LAST)")
    lake.mergeAdjacentFiles("spatial_sort_test")
    assert(lake.listFiles("spatial_sort_test").count() == 1)
    // rows in the merged file are in hilbert order
    val got = lake.tableWithRowId("spatial_sort_test")
      .orderBy(col("file_row_number"))
      .select(expr("st_hilbert(st_point(i, j))").as("h"))
      .as[Long].collect().toSeq
    assert(got == got.sorted, s"not hilbert-sorted: $got")
    assert(lake.table("spatial_sort_test").count() == 8)
  }

  test("st_hilbert over a geometry column sorts inserts; NULLS LAST") {
    val lake = freshLake()
    lake.createTable("pts", StructType(Seq(
      StructField("id", IntegerType), Lake.geometryField("g"))))
    lake.setSortedBy("pts", Seq(("st_hilbert(g)", "asc")))
    val scattered = Seq(
      (1, GeoWkb.pointWkb(90.0, 90.0)),
      (2, null.asInstanceOf[Array[Byte]]),
      (3, GeoWkb.pointWkb(-5.0, -5.0)),
      (4, GeoWkb.pointWkb(0.5, 0.5)),
      (5, GeoWkb.pointWkb(89.0, 91.0)))
    lake.append("pts", scattered.toDF("id", "g").coalesce(1))
    val ids = lake.tableWithRowId("pts").orderBy(col("file_row_number"))
      .select("id").as[Int].collect().toSeq
    // hilbert order clusters (90,90) with (89,91); NULL geometry sorts last
    assert(ids.last == 2, s"NULL sort key must come last, got $ids")
    val pos = ids.zipWithIndex.toMap
    assert(math.abs(pos(1) - pos(5)) == 1,
      s"nearby points must be adjacent after hilbert sort: $ids")
  }

  test("invalid sort expressions fail at SET SORTED BY time") {
    val lake = freshLake()
    lake.createTable("v", StructType(Seq(StructField("x", LongType))))
    val e = intercept[IllegalArgumentException](
      lake.setSortedBy("v", Seq(("no_such_col + 1", "asc"))))
    assert(e.getMessage.contains("invalid sort expression"))
  }

  test("RESET SORTED BY: subsequent inserts no longer sort") {
    val lake = freshLake()
    lake.sql("CREATE TABLE rs (x BIGINT)")
    lake.sql("ALTER TABLE rs SET SORTED BY (x DESC)")
    lake.sql("INSERT INTO rs VALUES (1), (3), (2)")
    val t = lake.meta.tableByName("rs", lake.currentSnapshotId()).get
    assert(lake.meta.currentSortSpec(t.tableId,
      lake.currentSnapshotId()).nonEmpty)
    lake.sql("ALTER TABLE rs RESET SORTED BY")
    assert(lake.meta.currentSortSpec(t.tableId,
      lake.currentSnapshotId()).isEmpty)
    lake.sql("INSERT INTO rs VALUES (5), (4)")
    assert(lake.table("rs").count() == 5)
  }

  test("SET/RESET PARTITIONED BY via SQL, with reference error cases") {
    val lake = freshLake()
    lake.sql("CREATE TABLE pb (user_id BIGINT, v VARCHAR)")
    lake.sql("ALTER TABLE pb SET PARTITIONED BY (bucket(4, user_id))")
    lake.sql("INSERT INTO pb VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val files = lake.listFiles("pb").collect().map(_.getString(0))
    assert(files.forall(_.contains("bucket=")))
    lake.sql("ALTER TABLE pb RESET PARTITIONED BY")
    lake.sql("INSERT INTO pb VALUES (9, 'z')")
    val after = lake.listFiles("pb").collect().map(_.getString(0))
    assert(after.exists(!_.contains("bucket=")))
    assert(lake.table("pb").count() == 4)
    // reference rejects malformed bucket widths at ALTER time
    intercept[IllegalArgumentException](
      lake.sql("ALTER TABLE pb SET PARTITIONED BY (bucket(0, user_id))"))
    intercept[IllegalArgumentException](
      lake.sql("ALTER TABLE pb SET PARTITIONED BY (bucket('abc', user_id))"))
    // identity + transform mix
    lake.sql("CREATE TABLE pb2 (k BIGINT, ts TIMESTAMP, s VARCHAR)")
    lake.sql("ALTER TABLE pb2 SET PARTITIONED BY (bucket(8, k), year(ts), s)")
    val t2 = lake.meta.tableByName("pb2", lake.currentSnapshotId()).get
    val ps = lake.meta.currentPartitionSpec(t2.tableId,
      lake.currentSnapshotId()).get
    assert(ps.fields.map(_.transform) == Seq("bucket(8)", "year", "identity"))
  }
}
