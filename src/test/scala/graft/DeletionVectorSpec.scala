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

  test("puffin framing round-trips and carries the spec's markers") {
    val ps = Seq(3L, 4L, 99999L)
    val bytes = DeletionVectors.serializePuffin("t/data-1.parquet",
      ps.iterator)
    // Iceberg Puffin structure: leading + trailing "PFA1" magic, JSON
    // footer referencing the data file and the deletion-vector-v1 type
    assert(bytes.take(4).sameElements("PFA1".getBytes))
    assert(bytes.takeRight(4).sameElements("PFA1".getBytes))
    val text = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(text.contains("deletion-vector-v1"))
    assert(text.contains("t/data-1.parquet"))
    assert(text.contains("\"cardinality\":\"3\""))
    assert(DeletionVectors.isPuffin(bytes))
    assert(DeletionVectors.positions(bytes) == ps)
    assert(DeletionVectors.cardinality(bytes) == 3)
    // legacy blobs are still recognized by the same reader
    val legacy = DeletionVectors.serialize(ps.iterator)
    assert(!DeletionVectors.isPuffin(legacy))
    assert(DeletionVectors.positions(legacy) == ps)
    // corruption is detected (CRC over magic+vector)
    val corrupted = bytes.clone(); corrupted(12) = (corrupted(12) ^ 1).toByte
    intercept[IllegalArgumentException](DeletionVectors.positions(corrupted))
  }

  test("puffin DVs flow through delete, union and time travel") {
    val lake = freshLake()
    lake.setOption("deletion_vector_format", "puffin")
    lake.createTableAs("p", (1L to 100L).toDF("id").coalesce(1))
    assert(lake.delete("p", col("id") <= 10L) == 10)
    assert(lake.table("p").count() == 90)
    val t = lake.meta.tableByName("p", lake.currentSnapshotId()).get
    val dels = lake.meta.filesForScan(t.tableId, lake.currentSnapshotId())
      .flatMap(_.deleteFiles)
    assert(dels.nonEmpty && dels.forall(_.path.endsWith(".puffin")))
    // consecutive delete unions into a fresh puffin DV
    assert(lake.delete("p", col("id") > 90L) == 10)
    assert(lake.table("p").count() == 80)
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

  test("bulk delete across many files writes distributed, per-file") {
    // DV path: one blob per data file, serialized executor-side; the
    // positional path (sibling lake) writes one part per shuffle task —
    // neither funnels the statement's positions through a single task or
    // collects them on the driver
    val lake = freshLake()
    lake.createTableAs("m", (1L to 12000L).toDF("id").repartition(120))
    val t = lake.meta.tableByName("m", lake.currentSnapshotId()).get
    val nFiles = lake.meta.filesForScan(t.tableId,
      lake.currentSnapshotId()).size
    assert(nFiles >= 100, s"expected >=100 data files, got $nFiles")
    assert(lake.delete("m", col("id") % 2 === 0) == 6000)
    val dels = lake.meta.filesForScan(t.tableId, lake.currentSnapshotId())
      .flatMap(_.deleteFiles)
    assert(dels.size == nFiles) // every file got its own DV blob
    assert(dels.map(_.path).distinct.size == nFiles)
    assert(lake.table("m").count() == 6000)

    // positional path across the same shape: parts map 1:1 to tasks, so
    // multiple delete parquet files exist (not coalesce(1))
    val dir2 = Files.createTempDirectory("graftdel").toString
    val lake2 = Lake.attach(spark, s"$dir2/catalog", s"$dir2/data")
    lake2.createTableAs("m", (1L to 12000L).toDF("id").repartition(120))
    assert(lake2.delete("m", col("id") % 2 === 0) == 6000)
    val t2 = lake2.meta.tableByName("m", lake2.currentSnapshotId()).get
    val dels2 = lake2.meta.filesForScan(t2.tableId,
      lake2.currentSnapshotId()).flatMap(_.deleteFiles)
    assert(dels2.map(_.path).distinct.size > 1)
    assert(lake2.table("m").count() == 6000)
    // and positions within each part stay sorted per file for locality
    assert(lake2.table("m").agg(sum(col("id"))).head().getLong(0)
      == (1L to 12000L by 2).sum)
  }
}
