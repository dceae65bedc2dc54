package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LakeSession: the one-call production setup wires the extension, the
  * DSv2 catalog, AQE, and the registry together. */
class LakeSessionSpec extends AnyFunSuite {

  test("builder + attach give SQL DDL, DML and pruned reads in one call") {
    SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = LakeSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      val dir = Files.createTempDirectory("graftsess").toString
      val lake = LakeSession.attach(spark, s"$dir/cat", s"$dir/data")
      spark.sql("CREATE TABLE graft.t AS SELECT id FROM range(100)")
      spark.sql("INSERT INTO graft.t SELECT id + 100 FROM range(50)")
      spark.sql("DELETE FROM graft.t WHERE id >= 140")
      assert(spark.sql("SELECT COUNT(*) AS n FROM graft.t")
        .head().getLong(0) == 140L)
      assert(lake.table("t").count() == 140)
      spark.sql("CREATE VIEW graft.v AS SELECT id FROM graft.t WHERE id < 10")
      assert(spark.sql("SELECT COUNT(*) AS n FROM graft.v")
        .head().getLong(0) == 10L)
    } finally {
      LakeSession.detach()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
