package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VARIANT columns (reference ducklake_types.cpp:61,134): semi-structured
  * values stored as Spark 4 VariantType, queried with variant_get; type
  * string round-trips through the catalog. Geometry maps to WKB bytes. */
class VariantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("variant column round-trip + variant_get extraction") {
    val dir = Files.createTempDirectory("graftvar").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val df = Seq(
      (1L, """{"kind":"click","n":3}"""),
      (2L, """{"kind":"view","n":7,"extra":[1,2]}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("payload"))
    lake.createTableAs("ev", df)
    // catalog stores the reference's canonical type string
    assert(lake.schemaOf("ev")("payload").dataType ==
      org.apache.spark.sql.types.VariantType)
    val got = lake.table("ev")
      .select(col("id"),
        variant_get(col("payload"), "$.kind", "string").as("kind"),
        variant_get(col("payload"), "$.n", "long").as("n"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "click", 3L), (2L, "view", 7L)))
    // DML over variant rows
    lake.delete("ev", variant_get(col("payload"), "$.kind", "string") === "view")
    assert(lake.table("ev").count() == 1)
  }

  test("geometry type string maps to WKB binary") {
    assert(DuckLakeTypes.fromTypeString("geometry") ==
      org.apache.spark.sql.types.BinaryType)
    assert(DuckLakeTypes.fromTypeString("variant") ==
      org.apache.spark.sql.types.VariantType)
  }
}
