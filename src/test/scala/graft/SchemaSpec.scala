package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-schema catalog (reference ducklake_schema): qualified
  * schema.table names through the Lake API, SQL DDL, and the Catalyst
  * extension; same-named tables isolated per schema. */
class SchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("schemas isolate same-named tables; DDL + DML qualified") {
    val dir = Files.createTempDirectory("graftsch").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.sql("CREATE SCHEMA staging")
    assert(lake.listSchemas().contains("staging"))
    lake.createTableAs("t", Seq((1L, "main")).toDF("id", "src"))
    lake.createTableAs("staging.t", Seq((2L, "stg"), (3L, "stg"))
      .toDF("id", "src"))
    assert(lake.table("t").count() == 1)
    assert(lake.table("staging.t").count() == 2)
    // DML against the qualified table only touches it
    lake.sql("DELETE FROM staging.t WHERE id = 3")
    assert(lake.table("staging.t").count() == 1)
    assert(lake.table("t").count() == 1)
    assert(lake.table("staging.t").head().getString(1) == "stg")
    // time travel + rowids work on qualified tables
    assert(lake.tableWithRowId("staging.t").select("rowid").count() == 1)
    // drop guards: non-empty schema refuses, then drops clean
    intercept[Exception](lake.dropSchema("staging"))
    lake.dropTable("staging.t")
    lake.dropSchema("staging")
    assert(!lake.listSchemas().contains("staging"))
    intercept[IllegalArgumentException](lake.dropSchema("main"))
  }

  test("catalyst extension resolves graft.<schema>.<table>") {
    val base = SparkTestSession.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val ext = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      import ext.implicits._
      val dir = Files.createTempDirectory("graftsch2").toString
      val lake = Lake.attach(ext, s"$dir/cat", s"$dir/data")
      lake.createSchema("raw")
      lake.createTableAs("raw.ev", Seq((1L, 5.0), (2L, 7.0)).toDF("id", "x"))
      graft.plans.LakeRegistry.register("graft", lake)
      val n = ext.sql("SELECT SUM(x) AS s FROM graft.raw.ev")
        .head().getDouble(0)
      assert(n == 12.0)
      // schema-scoped views resolve as graft.<schema>.<view>, and a live
      // view blocks DROP SCHEMA like tables do
      lake.createView("raw.big", "SELECT id FROM raw.ev WHERE x > 6")
      assert(ext.sql("SELECT id FROM graft.raw.big").head().getLong(0) == 2L)
      lake.dropTable("raw.ev")
      val e = intercept[IllegalArgumentException](lake.dropSchema("raw"))
      assert(e.getMessage.contains("not empty"))
      lake.dropView("raw.big")
      lake.dropSchema("raw")
    } finally {
      graft.plans.LakeRegistry.unregister("graft")
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
