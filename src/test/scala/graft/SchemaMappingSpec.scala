package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-epoch read mapping: files are read with the column names/types
  * they were written under and projected to the current schema by stable
  * column_id (the field-id mapping of the reference,
  * ducklake_multi_file_reader.cpp / ducklake_name_map.cpp). RENAME/DROP —
  * top-level and nested — are metadata-only and never lose old-file data. */
class SchemaMappingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftsm").toString
    Lake.attach(spark, s"$dir/cat", s"$dir/data")
  }

  test("top-level rename keeps data written under the old name") {
    val lake = freshLake()
    lake.createTableAs("r", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    lake.renameColumn("r", "v", "v2")
    assert(lake.table("r").orderBy("id").select("v2").as[String]
      .collect().toSeq == Seq("a", "b"))
    // appends after the rename mix with old files
    lake.append("r", Seq((3L, "c")).toDF("id", "v2"))
    assert(lake.table("r").orderBy("id").select("v2").as[String]
      .collect().toSeq == Seq("a", "b", "c"))
    // time travel before the rename shows the old name WITH data
    val preRename = lake.currentSnapshotId() - 2
    val old = lake.tableAtVersion("r", preRename)
    assert(old.columns.toSeq == Seq("id", "v"))
    assert(old.orderBy("id").select("v").as[String].collect().toSeq ==
      Seq("a", "b"))
  }

  test("drop then re-add same name is a fresh column (old files read NULL)") {
    val lake = freshLake()
    lake.createTableAs("d", Seq((1L, "x")).toDF("id", "v"))
    lake.dropColumn("d", "v")
    lake.addColumn("d", StructField("v", StringType))
    // same name, new column_id — old file's v must NOT leak through
    assert(lake.table("d").select("v").head().isNullAt(0))
  }

  test("column added with default: old files read the default") {
    val lake = freshLake()
    lake.createTableAs("ad", Seq((1L, "a")).toDF("id", "v"))
    lake.addColumn("ad", StructField("flag", StringType),
      defaultValue = Some("new"))
    assert(lake.table("ad").select("flag").as[String].head() == "new")
    lake.append("ad", Seq((2L, "b", "explicit")).toDF("id", "v", "flag"))
    assert(lake.table("ad").orderBy("id").select("flag").as[String]
      .collect().toSeq == Seq("new", "explicit"))
  }

  test("nested rename field keeps old-file data") {
    val lake = freshLake()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("st", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType))))))
    lake.createTable("nr", schema)
    lake.append("nr", spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, Row(10, "ten")), Row(2L, Row(20, "twenty"))), 1), schema))
    lake.renameField("nr", "st.y", "label")
    assert(lake.schemaOf("nr")("st").dataType
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("x", "label"))
    assert(lake.table("nr").orderBy("id").select(col("st.label")).as[String]
      .collect().toSeq == Seq("ten", "twenty"))
    // appends after the rename join up
    lake.append("nr", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(3L, Row(30, "thirty"))), 1),
      lake.schemaOf("nr")))
    assert(lake.table("nr").orderBy("id").select(col("st.label")).as[String]
      .collect().toSeq == Seq("ten", "twenty", "thirty"))
  }

  test("nested drop field removes it; remaining fields keep data") {
    val lake = freshLake()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("st", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType),
        StructField("c", DoubleType))))))
    lake.createTable("nd", schema)
    lake.append("nd", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, Row(1, "one", 1.5))), 1),
      schema))
    lake.dropField("nd", "st.b")
    val st = lake.schemaOf("nd")("st").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("a", "c"))
    val r = lake.table("nd").select(col("st.a"), col("st.c")).head()
    assert(r.getInt(0) == 1 && r.getDouble(1) == 1.5)
    // dropping the last field is rejected
    lake.dropField("nd", "st.c")
    intercept[IllegalArgumentException](lake.dropField("nd", "st.a"))
  }

  test("rename/add field inside list<struct> keeps old-file data") {
    val lake = freshLake()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("items", ArrayType(StructType(Seq(
        StructField("sku", StringType), StructField("qty", IntegerType)))))))
    lake.createTable("lst", schema)
    lake.append("lst", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(Row("a", 2), Row("b", 3))),
        Row(2L, null)), 1), schema))
    // rename a field inside the list's element struct
    lake.renameField("lst", "items.element.qty", "quantity")
    val got = lake.table("lst").orderBy("id")
      .select(expr("transform(items, x -> x.quantity)").as("qs"))
      .collect()
    assert(got(0).getSeq[Int](0) == Seq(2, 3))
    assert(got(1).isNullAt(0)) // null list stays null through the mapping
    // add a field into the element struct; old rows read NULL
    lake.addField("lst", "items.element", StructField("price", DoubleType))
    val r = lake.table("lst").filter(col("id") === 1)
      .select(expr("items[0].price")).head()
    assert(r.isNullAt(0))
    // new appends with the full shape coexist with old files
    lake.append("lst", spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(3L, Seq(Row("c", 1, 9.5)))), 1), lake.schemaOf("lst")))
    val all = lake.table("lst").orderBy("id")
      .select(expr("aggregate(items, 0, (a, x) -> a + x.quantity)").as("s"))
      .collect()
    assert(all.map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq ==
      Seq(5, -1, 1))
  }

  test("map value struct rename keeps old-file data") {
    val lake = freshLake()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("attrs", MapType(StringType, StructType(Seq(
        StructField("v", IntegerType), StructField("u", StringType)))))))
    lake.createTable("mp", schema)
    lake.append("mp", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Map("w" -> Row(10, "kg")))), 1), schema))
    lake.renameField("mp", "attrs.value.u", "unit")
    val r = lake.table("mp").select(expr("attrs['w'].unit")).head()
    assert(r.getString(0) == "kg")
  }

  test("rename + widening + deletes combine on the non-fast scan path") {
    val lake = freshLake()
    lake.createTableAs("m",
      (1 to 100).map(i => (i, s"v$i")).toDF("id", "v"))
    lake.delete("m", col("id") > 90)
    lake.renameColumn("m", "v", "name")
    lake.changeColumnType("m", "id", LongType)
    val got = lake.table("m").orderBy("id")
    assert(got.count() == 90)
    assert(got.select("name").as[String].head() == "v1")
    assert(got.schema("id").dataType == LongType)
    // rowid surface still works across the mapped read
    assert(lake.tableWithRowId("m").select("rowid").distinct().count() == 90)
  }

  test("compaction rewrites old-epoch files into the current schema") {
    val lake = freshLake()
    lake.createTableAs("cp", Seq((1L, "a")).toDF("id", "v"))
    lake.append("cp", Seq((2L, "b")).toDF("id", "v"))
    lake.renameColumn("cp", "v", "w")
    lake.mergeAdjacentFiles("cp")
    assert(lake.table("cp").orderBy("id").select("w").as[String]
      .collect().toSeq == Seq("a", "b"))
    // merged file now carries current names: scan again post-compaction
    assert(lake.tableWithRowId("cp").count() == 2)
  }

  test("inlined rows survive a rename via pre-rename flush") {
    val lake = freshLake()
    lake.createTable("il", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    lake.setOption("data_inlining_row_limit", "10")
    lake.append("il", Seq((1L, "x")).toDF("id", "v"))
    lake.renameColumn("il", "v", "w")
    assert(lake.table("il").select("w").as[String].collect().toSeq ==
      Seq("x"))
  }

  test("filter on a DEFAULT-added column matches old files " +
    "(reference issue_1135)") {
    val lake = freshLake()
    lake.createTableAs("t", (0L until 10L).toDF("a").coalesce(1))
    lake.addColumn("t", StructField("b", IntegerType), Some("42"))
    // files written before b existed have no stats for it: pruning must
    // keep them and the projected default must satisfy the filter
    assert(lake.table("t", Some(col("b") === 42)).count() == 10)
    assert(lake.table("t").filter(col("b") === 42).count() == 10)
    assert(lake.table("t", Some(col("b") === 7)).count() == 0)
    // mixed epochs: new rows carry a real b column
    lake.append("t", Seq((100L, 42), (101L, 7)).toDF("a", "b"))
    assert(lake.table("t", Some(col("b") === 42)).count() == 11)
    assert(lake.table("t", Some(col("b") === 7)).count() == 1)
    assert(lake.table("t").filter(col("b").isNotNull).count() == 12)
  }
}
