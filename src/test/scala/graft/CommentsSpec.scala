package graft

import java.nio.file.Files

import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

/** COMMENT ON TABLE/VIEW/COLUMN (reference test/sql/comments family):
  * versioned 'comment' tags, updatable, clearable with IS NULL, and
  * column comments keyed by column_id so they survive renames. */
class CommentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftcmt").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  test("table comments: set, update, clear (comment_mixed_operations)") {
    val lake = freshLake()
    lake.createTableAs("t", Seq((1, "a")).toDF("id", "v"))
    assert(lake.comment("t").isEmpty)
    lake.sql("COMMENT ON TABLE t IS 'very gezellige table'")
    assert(lake.comment("t").contains("very gezellige table"))
    lake.sql("COMMENT ON TABLE t IS 'toch niet zo gezellig'")
    assert(lake.comment("t").contains("toch niet zo gezellig"))
    lake.sql("COMMENT ON TABLE t IS NULL")
    assert(lake.comment("t").isEmpty)
  }

  test("column comments survive RENAME COLUMN (comment_on_column)") {
    val lake = freshLake()
    lake.createTableAs("t2", Seq((1, "a")).toDF("id", "v"))
    lake.sql("COMMENT ON COLUMN t2.v IS 'very gezellige column'")
    assert(lake.columnComment("t2", "v").contains("very gezellige column"))
    lake.renameColumn("t2", "v", "w")
    assert(lake.columnComment("t2", "w").contains("very gezellige column"))
    lake.sql("COMMENT ON COLUMN t2.w IS NULL")
    assert(lake.columnComment("t2", "w").isEmpty)
    // unknown column errors
    intercept[IllegalArgumentException](
      lake.sql("COMMENT ON COLUMN t2.nope IS 'x'"))
  }

  test("view comments (comment_on_view_column family, object level)") {
    val lake = freshLake()
    lake.createTableAs("base", Seq((1, "a")).toDF("id", "v"))
    lake.createView("vw", "SELECT id FROM base")
    lake.sql("COMMENT ON VIEW vw IS 'a view'")
    assert(lake.comment("vw").contains("a view"))
    lake.sql("COMMENT ON VIEW vw IS NULL")
    assert(lake.comment("vw").isEmpty)
  }

  test("view COLUMN comments key by output name " +
      "(format v1.1 ducklake_view_column_tag)") {
    val lake = freshLake()
    lake.createTableAs("base", Seq((1, "a")).toDF("id", "v"))
    lake.createView("vw", "SELECT id AS key, v FROM base")
    lake.commentOnColumn("vw", "key", "the key")
    assert(lake.columnComment("vw", "key").contains("the key"))
    assert(lake.columnComment("vw", "v").isEmpty)
    // unknown output column errors
    intercept[IllegalArgumentException](
      lake.commentOnColumn("vw", "nope", "x"))
    // comments survive ALTER VIEW RENAME (same view_id)
    lake.renameView("vw", "vw2")
    assert(lake.columnComment("vw2", "key").contains("the key"))
    // NULL clears
    lake.commentOnColumn("vw2", "key", null)
    assert(lake.columnComment("vw2", "key").isEmpty)
  }

  test("nested-field comments by dotted path") {
    val lake = freshLake()
    lake.sql("CREATE TABLE n (id BIGINT, info STRUCT(g BIGINT, h STRING))")
    lake.sql("COMMENT ON COLUMN n.info.g IS 'nested leaf'")
    assert(lake.columnComment("n", "info.g").contains("nested leaf"))
    assert(lake.columnComment("n", "info.h").isEmpty)
  }
}
