package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Nested ADD FIELD (reference ducklake_table_entry.cpp:1148): old files
  * read the new struct field back as NULL; narrowing struct changes are
  * rejected. */
class NestedEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("add field to struct column; old rows read NULL") {
    val dir = Files.createTempDirectory("graftnf").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("st", StructType(Seq(StructField("x", IntegerType))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, Row(10))), 1), schema)
    lake.createTable("n", schema)
    lake.append("n", df)
    lake.addField("n", "st", StructField("y", StringType))
    // old file: y reads back NULL
    val r1 = lake.table("n").select(col("st.x"), col("st.y")).head()
    assert(r1.getInt(0) == 10 && r1.isNullAt(1))
    // new append carries the field
    val schema2 = lake.schemaOf("n")
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, Row(20, "hi"))), 1), schema2)
    lake.append("n", df2)
    assert(lake.table("n").filter(col("st.y") === "hi").count() == 1)
    // duplicate field and non-struct column rejected
    intercept[IllegalArgumentException](
      lake.addField("n", "st", StructField("x", IntegerType)))
    intercept[IllegalArgumentException](
      lake.addField("n", "id", StructField("z", IntegerType)))
    // narrowing a field INSIDE the struct is rejected
    intercept[IllegalArgumentException](
      lake.changeColumnType("n", "st", StructType(Seq(
        StructField("x", ByteType), StructField("y", StringType)))))
  }

  test("SET DATA TYPE STRUCT evolves by field-name diff " +
      "(reference struct_evolution / struct_evolution_reuse)") {
    val dir = Files.createTempDirectory("graftse").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    def insert(rows: Row*): Unit = {
      val schema = lake.schemaOf("t")
      lake.append("t", spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row(_)), 1), schema))
    }
    def all(): Seq[Row] =
      lake.table("t").select("col1.*").collect().toSeq
    lake.createTable("t", StructType(Seq(StructField("col1",
      StructType(Seq(StructField("i", IntegerType),
        StructField("j", IntegerType)))))))
    insert(Row(1, 2))
    // add k TINYINT: old rows read NULL
    lake.changeColumnType("t", "col1", StructType(Seq(
      StructField("i", IntegerType), StructField("j", IntegerType),
      StructField("k", ByteType))))
    insert(Row(10, 20, 3.toByte), Row(11, 21, 10.toByte))
    // promote k to INT (matched name widens, id preserved)
    lake.changeColumnType("t", "col1", StructType(Seq(
      StructField("i", IntegerType), StructField("j", IntegerType),
      StructField("k", IntegerType))))
    insert(Row(100, 200, 1000))
    assert(all().map(r => (r.get(0), r.get(1), r.get(2))).toSet == Set(
      (1, 2, null), (10, 20, 3), (11, 21, 10), (100, 200, 1000)))
    // drop i: old files read j,k only
    lake.changeColumnType("t", "col1", StructType(Seq(
      StructField("j", IntegerType), StructField("k", IntegerType))))
    insert(Row(150, 1000))
    assert(all().map(r => (r.get(0), r.get(1))).toSet == Set(
      (2, null), (20, 3), (21, 10), (200, 1000), (150, 1000)))
    // drop j too: only k remains
    lake.changeColumnType("t", "col1", StructType(Seq(
      StructField("k", IntegerType))))
    insert(Row(10000))
    assert(all().map(_.get(0)).toSet == Set(null, 3, 10, 1000, 10000))
    // re-adding a dropped NAME mints a new field id: old data never
    // resurrects (struct_evolution_reuse.test)
    lake.changeColumnType("t", "col1", StructType(Seq(
      StructField("k", IntegerType), StructField("i", IntegerType))))
    val iVals = lake.table("t").select("col1.i").collect()
      .map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
    assert(iVals.count(_ == null) == 6) // every pre-re-add row reads NULL
    // narrowing a matched field still errors
    intercept[IllegalArgumentException](
      lake.changeColumnType("t", "col1", StructType(Seq(
        StructField("k", ByteType), StructField("i", IntegerType)))))
    lake.detach()
  }
}
