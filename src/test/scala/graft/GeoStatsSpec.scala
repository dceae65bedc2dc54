package graft

import java.nio.file.Files

import graft.catalog._
import graft.functions.{GeoFunctions, GeoWkb}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Geometry column stats + bbox pruning, mirroring the reference's
  * test/sql/geo/ducklake_geometry_stats.test extent-merge sequence. */
class GeoStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftgeo").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  private def geoTable(lake: Lake, name: String): Unit =
    lake.createTable(name, StructType(Seq(
      StructField("id", IntegerType), Lake.geometryField("g"))))

  private def pts(lake: Lake, name: String, rows: (Int, (Double, Double))*)
      : Unit =
    lake.append(name,
      rows.map { case (i, (x, y)) => (i, GeoWkb.pointWkb(x, y)) }
        .toDF("id", "g").coalesce(1)) // one data file per append

  private def extent(lake: Lake, name: String,
      column: String = "g"): GeoWkb.Extent = {
    val extra = lake.tableColumnStats(name)
      .filter(col("column_name") === column)
      .select("extra_stats").as[String].head()
    GeoWkb.deserialize(extra)
  }

  test("wkb extent parsing covers all shapes, endianness and Z/M") {
    val e = GeoWkb.extent(GeoWkb.pointWkb(3.0, -4.0)).get
    assert(e.xmin == 3.0 && e.xmax == 3.0 && e.ymin == -4.0 && e.ymax == -4.0)
    assert(e.types == Set("POINT") && !e.hasZ && !e.hasM)

    val ls = GeoWkb.extent(
      GeoWkb.lineStringWkb(Seq((0.0, 0.0), (2.0, 5.0), (-1.0, 1.0)))).get
    assert(ls.xmin == -1.0 && ls.xmax == 2.0 && ls.ymax == 5.0)
    assert(ls.types == Set("LINESTRING"))

    // big-endian point with ISO Z code (1001): POINT Z (1 2 3)
    val be = java.nio.ByteBuffer.allocate(29)
    be.put(0.toByte).putInt(1001)
      .putDouble(1.0).putDouble(2.0).putDouble(3.0)
    val bz = GeoWkb.extent(be.array()).get
    assert(bz.xmin == 1.0 && bz.ymin == 2.0 && bz.zmin == 3.0 && bz.hasZ)

    // malformed blob → no stats, not an exception
    assert(GeoWkb.extent(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("extent merges across inserts like the reference stats sequence") {
    val lake = freshLake()
    geoTable(lake, "t1")
    pts(lake, "t1", 0 -> (0.0, 0.0))
    val e1 = extent(lake, "t1")
    assert(e1.xmin == 0.0 && e1.xmax == 0.0 && e1.ymin == 0.0 && e1.ymax == 0.0)
    pts(lake, "t1", 1 -> (-2.0, 2.0))
    val e2 = extent(lake, "t1")
    assert(e2.xmin == -2.0 && e2.xmax == 0.0 && e2.ymin == 0.0 && e2.ymax == 2.0)
    pts(lake, "t1", 3 -> (2.0, -2.0))
    val e3 = extent(lake, "t1")
    assert(e3.xmin == -2.0 && e3.xmax == 2.0 && e3.ymin == -2.0 && e3.ymax == 2.0)
    assert(e3.types == Set("POINT"))
  }

  test("sql DDL accepts GEOMETRY and round-trips WKB") {
    val lake = freshLake()
    lake.sql("CREATE TABLE geo (id INT, shape GEOMETRY)")
    lake.append("geo", Seq((1, GeoWkb.pointWkb(7.5, -1.25)))
      .toDF("id", "shape"))
    val got = lake.table("geo").select("shape").as[Array[Byte]].head()
    val e = GeoWkb.extent(got).get
    assert(e.xmin == 7.5 && e.ymin == -1.25)
    assert(extent(lake, "geo", "shape").xmax == 7.5)
  }

  test("st_bbox_intersects filters rows and prunes files by extent") {
    val lake = freshLake()
    geoTable(lake, "t2")
    // three files with disjoint extents
    pts(lake, "t2", 1 -> (0.0, 0.0), 2 -> (5.0, 5.0))
    pts(lake, "t2", 3 -> (100.0, 100.0), 4 -> (105.0, 105.0))
    pts(lake, "t2", 5 -> (200.0, 200.0))
    val pred = GeoFunctions.stBboxIntersects(col("g"),
      lit(90.0), lit(90.0), lit(110.0), lit(110.0))
    val df = lake.table("t2", Some(pred)).filter(pred)
    assert(df.select("id").as[Int].collect().sorted.toSeq == Seq(3, 4))
    // pruning: only the middle file is scanned
    val scanned = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length
    }.sum
    assert(scanned == 1, s"expected 1 file after geo pruning, saw $scanned")
  }

  test("nested geometry stats: struct + list leaves, pruning, compaction") {
    val lake = freshLake()
    lake.createTable("nest", StructType(Seq(
      StructField("id", IntegerType),
      StructField("info", StructType(Seq(
        Lake.geometryField("g"), StructField("tag", StringType)))),
      Lake.typedField("pts", "list<geometry>"))))
    val schema = lake.schemaOf("nest")
    def append(rows: (Int, (Double, Double))*): Unit =
      lake.append("nest", spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (i, (x, y)) =>
          org.apache.spark.sql.Row(i,
            org.apache.spark.sql.Row(GeoWkb.pointWkb(x, y), s"t$i"),
            Seq(GeoWkb.pointWkb(x + 1.0, y), GeoWkb.pointWkb(x - 1.0, y)))
        }, 1), schema))
    // three files with disjoint nested extents
    append(1 -> (0.0, 0.0), 2 -> (5.0, 5.0))
    append(3 -> (100.0, 100.0), 4 -> (105.0, 105.0))
    append(5 -> (200.0, 200.0))

    // cumulative stats exist under the leaves' dotted paths
    val eg = extent(lake, "nest", "info.g")
    assert(eg.xmin == 0.0 && eg.xmax == 200.0 &&
      eg.types == Set("POINT"))
    val ep = extent(lake, "nest", "pts.element")
    assert(ep.xmin == -1.0 && ep.xmax == 201.0)

    // bbox filter on the struct-nested leaf prunes to one file
    val pred = GeoFunctions.stBboxIntersects(col("info.g"),
      lit(90.0), lit(90.0), lit(110.0), lit(110.0))
    val df = lake.table("nest", Some(pred)).filter(pred)
    assert(df.select("id").as[Int].collect().sorted.toSeq == Seq(3, 4))
    val scanned = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length
    }.sum
    assert(scanned == 1,
      s"expected 1 file after nested geo pruning, saw $scanned")

    // nested extents survive compaction (statsFor path)
    lake.mergeAdjacentFiles("nest")
    val egc = extent(lake, "nest", "info.g")
    assert(egc.xmin == 0.0 && egc.xmax == 200.0)
    assert(extent(lake, "nest", "pts.element").xmax == 201.0)
    // and pruning still works on the merged layout
    assert(lake.table("nest", Some(pred)).filter(pred).count() == 2)
  }

  test("sql DDL declares nested geometry (STRUCT / [] / MAP syntax)") {
    val lake = freshLake()
    lake.sql("""CREATE TABLE gn (id INT,
      info STRUCT(g GEOMETRY, tag VARCHAR), pts GEOMETRY[])""")
    val schema = lake.schemaOf("gn")
    assert(schema("info").dataType.asInstanceOf[StructType]("g")
      .dataType == BinaryType)
    assert(schema("pts").dataType ==
      ArrayType(BinaryType, containsNull = true))
    lake.append("gn", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        1, org.apache.spark.sql.Row(GeoWkb.pointWkb(3.0, 4.0), "a"),
        Seq(GeoWkb.pointWkb(-5.0, 0.0)))), 1), schema))
    assert(extent(lake, "gn", "info.g").xmin == 3.0)
    assert(extent(lake, "gn", "pts.element").xmin == -5.0)
  }

  test("geometry stats survive compaction and null/empty handling") {
    val lake = freshLake()
    geoTable(lake, "t3")
    lake.append("t3", Seq(
      (1, GeoWkb.pointWkb(1.0, 1.0)),
      (2, null.asInstanceOf[Array[Byte]])).toDF("id", "g"))
    pts(lake, "t3", 3 -> (9.0, -9.0))
    lake.mergeAdjacentFiles("t3")
    val e = extent(lake, "t3")
    assert(e.xmin == 1.0 && e.xmax == 9.0 && e.ymin == -9.0 && e.ymax == 1.0)
    val stats = lake.tableColumnStats("t3")
      .filter(col("column_name") === "g").collect()(0)
    assert(stats.getAs[Boolean]("contains_null"))
  }
}
