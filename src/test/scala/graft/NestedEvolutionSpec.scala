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
    // struct narrowing (dropping a field via changeColumnType) rejected
    intercept[IllegalArgumentException](
      lake.changeColumnType("n", "st",
        StructType(Seq(StructField("x", IntegerType)))))
  }
}
