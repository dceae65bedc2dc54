package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic-concurrency semantics (FIXTURES.md §7, reference
  * src/storage/ducklake_transaction_state.cpp:142-243). */
@org.scalatest.tags.Slow
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftcc").toString
    Lake.attach(spark, s"$dir/catalog", s"$dir/data")
  }

  test("delete-vs-delete on the same data file conflicts") {
    val lake = freshLake()
    lake.createTableAs("t", (1L to 100L).toDF("id").coalesce(1))
    val base = lake.meta.currentSnapshot().snapshotId
    // writer A commits a delete against the file
    lake.delete("t", col("id") <= 10L)
    // writer B, still based on `base`, tries to delete from the same file
    val t = lake.meta.tableByName("t", base).get
    val files = lake.meta.filesForScan(t.tableId, base)
    val e = intercept[CommitConflictException] {
      lake.meta.commitDeletes(t.tableId, base,
        Seq((files.head.file.dataFileId, "t/fake.parquet", 1L, 10L)))
    }
    assert(e.getMessage.contains("concurrent delete"))
  }

  test("disjoint-file deletes from many concurrent writers all commit " +
      "(reference concurrent/file_level_conflict.test)") {
    val dir = Files.createTempDirectory("graftflc").toString
    val a = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    a.createTable("tbl", StructType(Seq(
      StructField("key", IntegerType), StructField("grouping", IntegerType))))
    a.setPartitionedBy("tbl", Seq(("grouping", "identity")))
    a.append("tbl", (0 until 1000).map(i => (i, i % 20))
      .toDF("key", "grouping").coalesce(1))
    a.setOption("max_retry_count", "100")
    // 20 writers, each deleting ONE key → each touches a different
    // partition file; file-level conflict detection must let all commit
    def runAll(range: Range, cond: Int => org.apache.spark.sql.Column): Unit = {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = range.map { i =>
        new Thread(() => {
          try {
            val l = Lake.attach(spark, s"$dir/cat", s"$dir/data")
            l.delete("tbl", cond(i)): Unit
          } catch { case t: Throwable => errs.add(t): Unit }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"unexpected conflicts: ${errs.peek()}")
    }
    runAll(0 until 20, i => col("key") === i)
    assert(a.table("tbl").count() == 980)
    assert(a.table("tbl").agg(sum(col("key"))).head().getLong(0) == 499310L)
    // two files per transaction, still disjoint across writers
    runAll(20 until 30, i => col("key") === i || col("key") === i + 10)
    assert(a.table("tbl").count() == 960)
    assert(a.table("tbl").agg(sum(col("key"))).head().getLong(0) == 498720L)
  }

  test("delete-vs-compaction conflicts") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(StructField("id", LongType))))
    (0 until 2).foreach(k =>
      lake.append("t", (k * 10L until (k + 1) * 10L).toDF("id").coalesce(1)))
    val base = lake.meta.currentSnapshot().snapshotId
    val t = lake.meta.tableByName("t", base).get
    val files = lake.meta.filesForScan(t.tableId, base)
    lake.mergeAdjacentFiles("t") // rewrites both files
    val e = intercept[CommitConflictException] {
      lake.meta.commitDeletes(t.tableId, base,
        Seq((files.head.file.dataFileId, "t/fake.parquet", 1L, 10L)))
    }
    assert(e.getMessage.contains("rewritten concurrently"))
  }

  test("create-vs-create same table name conflicts; appends never do") {
    val lake = freshLake()
    lake.createTable("dup", StructType(Seq(StructField("id", LongType))))
    intercept[CommitConflictException] {
      lake.createTable("dup", StructType(Seq(StructField("id", LongType))))
    }
    // ifNotExists path returns the existing table
    val t = lake.createTable("dup",
      StructType(Seq(StructField("id", LongType))), ifNotExists = true)
    assert(t.name == "dup")
  }

  test("append to concurrently dropped table conflicts") {
    val lake = freshLake()
    lake.createTable("gone", StructType(Seq(StructField("id", LongType))))
    val t = lake.meta.tableByName("gone",
      lake.meta.currentSnapshot().snapshotId).get
    lake.dropTable("gone")
    intercept[CommitConflictException] {
      lake.meta.appendFiles(t.tableId,
        Seq(PendingDataFile("gone/fake.parquet", 1L, 10L, Nil)))
    }
  }

  test("transaction commit conflicts with a concurrent schema change") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftccsc").toString
    val lake = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    val other = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    lake.createTableAs("t", Seq((1L, "a")).toDF("id", "v"))
    lake.begin()
    lake.append("t", Seq((2L, "b")).toDF("id", "v"))
    // a CONCURRENT writer's ALTER landing between BEGIN and COMMIT would
    // make the staged file (written under the old schema) read under the
    // post-ALTER epoch; must conflict instead. (The same handle's own
    // in-txn ALTER is buffered and guarded separately — TransactionSpec.)
    other.addColumn("t", StructField("extra", IntegerType))
    val e = intercept[CommitConflictException](lake.commit())
    assert(e.getMessage.contains("altered concurrently"))
    // failed commit kept the txn state: rollback cleans the staged files
    lake.rollback()
    assert(lake.table("t").count() == 1)
    assert(lake.deleteOrphanedFiles("t", dryRun = true).isEmpty)
    // and a fresh transaction works after the rollback
    lake.transaction {
      lake.append("t", Seq((3L, "c", 7)).toDF("id", "v", "extra"))
    }
    assert(lake.table("t").count() == 2)
  }

  test("compaction-vs-delete conflicts (the reverse direction): a delete " +
    "landing on the inputs since planning fails the compaction commit") {
    val lake = freshLake()
    lake.createTable("t", StructType(Seq(StructField("id", LongType))))
    (0 until 2).foreach(k =>
      lake.append("t", (k * 10L until (k + 1) * 10L).toDF("id").coalesce(1)))
    val base = lake.meta.currentSnapshot().snapshotId
    val t = lake.meta.tableByName("t", base).get
    val files = lake.meta.filesForScan(t.tableId, base)
    // a compaction planned at `base` would materialize all 20 rows; this
    // delete commits AFTER that plan — installing the merged file would
    // resurrect id=3, so the compaction commit must conflict instead
    lake.delete("t", col("id") === 3L)
    val e = intercept[CommitConflictException] {
      lake.meta.commitCompaction(t.tableId, files.map(_.file.dataFileId),
        PendingDataFile("t/fake_merged.parquet", 20L, 100L, Nil,
          hasRowIds = true),
        files.head.file.rowIdStart, baseSnapshot = Some(base))
    }
    assert(e.getMessage.contains("concurrent delete"), e.getMessage)
    // the real API replans and succeeds: the merged file then CARRIES the
    // delete (19 rows), nothing resurrects
    assert(lake.mergeAdjacentFiles("t") == 1)
    assert(lake.table("t").count() == 19)
    assert(lake.table("t").filter(col("id") === 3L).count() == 0)
  }
}

/** All-types round-trip (FIXTURES.md §2: DuckDB test_all_types() minus the
  * DuckLake-unsupported set). */
class AllTypesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("type-string codec round-trips every supported type") {
    import graft.catalog.DuckLakeTypes._
    val types: Seq[DataType] = Seq(BooleanType, ByteType, ShortType,
      IntegerType, LongType, FloatType, DoubleType, DecimalType(4, 1),
      DecimalType(38, 10), StringType, BinaryType, DateType,
      TimestampType, TimestampNTZType,
      ArrayType(IntegerType), ArrayType(ArrayType(StringType)),
      MapType(StringType, LongType),
      StructType(Seq(StructField("a", IntegerType),
        StructField("b", ArrayType(DoubleType)))))
    types.foreach { t =>
      assert(fromTypeString(toTypeString(t)) == t, s"round-trip of $t")
    }
    // unsupported types are rejected, like the reference
    intercept[IllegalArgumentException](toTypeString(NullType))
    // uint widening on read
    assert(fromTypeString("uint64") == DecimalType(20, 0))
    assert(fromTypeString("int128") == DecimalType(38, 0))
  }

  test("lake round-trips an all-types table with NULL rows") {
    import org.apache.spark.sql.Row
    val dir = java.nio.file.Files.createTempDirectory("graftat").toString
    val lake = graft.catalog.Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i8", ByteType),
      StructField("i16", ShortType), StructField("i32", IntegerType),
      StructField("i64", LongType), StructField("f32", FloatType),
      StructField("f64", DoubleType), StructField("dec", DecimalType(10, 2)),
      StructField("s", StringType), StructField("bin", BinaryType),
      StructField("d", DateType), StructField("ts", TimestampType),
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, IntegerType)),
      StructField("st", StructType(Seq(StructField("x", IntegerType),
        StructField("y", StringType))))))
    val rows = Seq(
      Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5,
        BigDecimal("12345.67").bigDecimal, "hello", Array[Byte](1, 2),
        java.sql.Date.valueOf("2020-01-01"),
        java.sql.Timestamp.valueOf("2020-01-01 12:34:56"),
        Seq(1, 2, 3), Map("k" -> 1), Row(7, "z")),
      Row(null, null, null, null, null, null, null, null, null, null,
        null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    lake.createTable("at", schema)
    lake.append("at", df)
    val got = lake.table("at")
    assert(got.count() == 2)
    assert(got.schema == schema)
    val r = got.filter(org.apache.spark.sql.functions.col("b").isNotNull)
      .head()
    assert(r.getSeq[Int](r.fieldIndex("arr")) == Seq(1, 2, 3))
    assert(r.getMap[String, Int](r.fieldIndex("m")) == Map("k" -> 1))
    assert(r.getAs[Row]("st") == Row(7, "z"))
    assert(got.filter(org.apache.spark.sql.functions.col("b").isNull)
      .count() == 1)
  }


}
