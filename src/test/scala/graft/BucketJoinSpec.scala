package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-co-partitioned bucket-wise join ([[Lake.bucketJoin]]): the
  * shuffle-free join path over two tables bucket-partitioned with the
  * same width on their join keys. */
class BucketJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftbj").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  test("bucket join equals plain join, including pre-spec files and " +
    "NULL keys, with zero shuffle exchanges") {
    val lake = freshLake()
    lake.createTable("fact", StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    // one file written BEFORE the bucket spec exists: it is never
    // partition-pruned, so every branch sees it and the residual
    // bucket(k)=b predicate must slice it exactly once
    lake.append("fact",
      Seq((1L, "pre1"), (7L, "pre7"), (12L, "pre12")).toDF("k", "v"))
    lake.setPartitionedBy("fact", Seq(("k", "bucket(4)")))
    lake.append("fact", (0L until 200L).map(i => (i % 40, s"f$i"))
      .toDF("k", "v"))
    lake.append("fact", Seq[(Option[Long], String)]((None, "fnull"))
      .toDF("k", "v"))

    lake.createTable("dim", StructType(Seq(
      StructField("k2", LongType), StructField("name", StringType))))
    lake.setPartitionedBy("dim", Seq(("k2", "bucket(4)")))
    lake.append("dim", (0L until 30L).map(i => (i, s"d$i")).toDF("k2", "name"))

    val got = lake.bucketJoin("fact", "k", "dim", "k2")
    val expected = lake.table("fact")
      .join(lake.table("dim"), col("k") === col("k2"), "inner")
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "k2", "name").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3))).sortBy(t => (t._1, t._2))
    assert(sortedRows(got).toSeq == sortedRows(expected).toSeq)
    // pre-spec rows joined exactly once each
    val pre = got.filter(col("v").startsWith("pre")).collect()
    assert(pre.length == 3)
    // the whole multi-branch plan runs without a single shuffle: each
    // branch is a broadcast join over that bucket's files only
    val shuffles = got.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, s"expected no shuffles, got: $shuffles")
  }

  test("branch scans prune to the bucket's files") {
    val lake = freshLake()
    lake.createTable("t1", StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    lake.setPartitionedBy("t1", Seq(("k", "bucket(8)")))
    lake.append("t1", (0L until 400L).map(i => (i % 80, s"x$i")).toDF("k", "v"))
    val t = lake.meta.tableByName("t1", lake.currentSnapshotId()).get
    val ps = lake.meta.currentPartitionSpec(t.tableId,
      lake.currentSnapshotId()).get
    val all = lake.meta.filesForScan(t.tableId, lake.currentSnapshotId())
    val one = lake.meta.filesForScan(t.tableId, lake.currentSnapshotId(),
      partitionEq = Seq((ps.fields.head.keyIndex, "3")),
      partitionSpecId = Some(ps.partitionId))
    assert(one.size < all.size)
  }

  test("mismatched widths and non-bucketed tables are rejected") {
    val lake = freshLake()
    lake.createTable("a", StructType(Seq(StructField("k", LongType))))
    lake.setPartitionedBy("a", Seq(("k", "bucket(4)")))
    lake.createTable("b", StructType(Seq(StructField("k", LongType))))
    lake.setPartitionedBy("b", Seq(("k", "bucket(8)")))
    lake.append("a", Seq(1L).toDF("k"))
    lake.append("b", Seq(1L).toDF("k"))
    val e = intercept[IllegalArgumentException](
      lake.bucketJoin("a", "k", "b", "k"))
    assert(e.getMessage.contains("bucket widths differ"))
    lake.createTable("c", StructType(Seq(StructField("k", LongType))))
    val e2 = intercept[IllegalArgumentException](
      lake.bucketJoin("a", "k", "c", "k"))
    assert(e2.getMessage.contains("not partitioned"))
  }
}
