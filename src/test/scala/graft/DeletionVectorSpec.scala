package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Roaring deletion vectors (write_deletion_vectors option, reference
  * deletion_vectors test config + ducklake_deletion_vector.cpp). */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftdv").toString
    val lake = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    lake.setOption("write_deletion_vectors", "true")
    lake
  }

  test("roaring round-trip") {
    val ps = Seq(0L, 5L, 7L, 1000000L)
    val bytes = DeletionVectors.serialize(ps.iterator)
    assert(DeletionVectors.positions(bytes) == ps)
    assert(DeletionVectors.cardinality(bytes) == 4)
  }

  test("delete with DVs: scan, union, time travel, CDC") {
    val lake = freshLake()
    lake.createTableAs("t", (1L to 100L).toDF("id").coalesce(1))
    val v1 = lake.currentSnapshotId()
    assert(lake.delete("t", col("id") % 10 === 0) == 10)
    // delete file registered as roaring, not parquet
    val t = lake.meta.tableByName("t", lake.currentSnapshotId()).get
    val dels = lake.meta.filesForScan(t.tableId, lake.currentSnapshotId())
      .flatMap(_.deleteFiles)
    assert(dels.nonEmpty && dels.forall(_.format == "roaring"))
    assert(lake.table("t").count() == 90)
    // consecutive delete unions into a fresh DV
    assert(lake.delete("t", col("id") === 1L) == 1)
    assert(lake.table("t").count() == 89)
    assert(lake.tableAtVersion("t", v1).count() == 100)
    // CDC deletions resolve rows from the DV
    val d2 = lake.currentSnapshotId()
    val deletions = lake.tableDeletions("t", v1, d2)
    assert(deletions.select("id").as[Long].collect().sorted.toSeq ==
      (Seq(1L) ++ (1 to 10).map(_ * 10L)).sorted)
    // rewrite threshold still computes from DV cardinality
    lake.delete("t", col("id") <= 96L)
    assert(lake.rewriteDataFiles("t", 0.9) == 1)
    assert(lake.table("t").as[Long].collect().sorted.toSeq ==
      Seq(97L, 98L, 99L))
  }

  test("update with DVs keeps one-snapshot semantics") {
    val lake = freshLake()
    lake.createTableAs("u", (1L to 50L).toDF("id").coalesce(1))
    val before = lake.currentSnapshotId()
    lake.update("u", Map("id" -> (col("id") + 1000L)), col("id") <= 5L)
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("u").count() == 50)
    assert(lake.table("u").filter(col("id") > 1000L).count() == 5)
  }
}
