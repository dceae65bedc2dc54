package graft

import java.nio.file.Files

import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

/** ducklake_set_option surface: parquet write options and table scoping
  * (reference ducklake_set_option.cpp — table_name=> scope wins over the
  * global value). */
class OptionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dataSize(dir: String, table: String): Long = {
    val p = java.nio.file.Paths.get(s"$dir/data/$table")
    Files.walk(p).filter(_.toString.endsWith(".parquet"))
      .mapToLong(Files.size).sum()
  }

  test("commit-retry knobs are settings-driven with safe defaults") {
    val dir = Files.createTempDirectory("graftopt0").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    assert(lake.meta.maxRetries == 10)
    assert(lake.meta.retryWaitMs == 100L)
    lake.setOption("max_retry_count", "3")
    lake.setOption("retry_wait_ms", "5")
    lake.setOption("retry_backoff", "2.0")
    assert(lake.meta.maxRetries == 3)
    assert(lake.meta.retryWaitMs == 5L)
    assert(lake.meta.retryBackoff == 2.0)
  }

  test("parquet_compression applies; table scope beats global") {
    val dir = Files.createTempDirectory("graftopt").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val df = (1 to 20000).map(i => (i.toLong, s"value_$i" * 3))
      .toDF("id", "v")

    lake.setOption("parquet_compression", "uncompressed")
    lake.createTable("big", df.schema)
    lake.append("big", df)
    val uncompressed = dataSize(dir, "big")

    // table-scoped zstd on a second table overrides the global setting
    lake.createTable("small", df.schema)
    lake.setOption("parquet_compression", "zstd", table = Some("small"))
    lake.setOption("parquet_compression_level", "6", table = Some("small"))
    lake.append("small", df)
    val compressed = dataSize(dir, "small")

    assert(compressed < uncompressed / 2,
      s"zstd ($compressed B) should be far smaller than uncompressed " +
        s"($uncompressed B)")
    assert(lake.table("small").count() == 20000)

    // scoped row-group sizing is honored without breaking reads
    lake.setOption("parquet_row_group_size_bytes", "65536",
      table = Some("small"))
    lake.append("small", df)
    assert(lake.table("small").count() == 40000)
  }

  test("parquet_version and row-count row groups (reference " +
      "parquet_compression.test)") {
    val dir = Files.createTempDirectory("graftoptv").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.setOption("parquet_compression", "zstd")
    lake.setOption("parquet_version", "2")
    lake.setOption("parquet_row_group_size", "64000")
    lake.createTableAs("tbl",
      (0 until 100000).map(i => (i.toLong, s"hello world$i")).toDF("i", "str")
        .coalesce(1))
    // footer: zstd everywhere, >= 2 row groups (100k rows / 64k cap)
    val file = Files.walk(java.nio.file.Paths.get(s"$dir/data/tbl"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val conf = new org.apache.hadoop.conf.Configuration()
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString), conf))
    try {
      val blocks = r.getFooter.getBlocks
      assert(blocks.size >= 2, s"expected >=2 row groups, got ${blocks.size}")
      import scala.jdk.CollectionConverters._
      val codecs = blocks.asScala.flatMap(_.getColumns.asScala)
        .map(_.getCodec.toString).toSet
      assert(codecs == Set("ZSTD"))
      // v2: data pages use v2 encodings (DELTA_*) instead of PLAIN
      val encodings = blocks.asScala.flatMap(_.getColumns.asScala)
        .flatMap(_.getEncodings.asScala.map(_.toString)).toSet
      assert(encodings.exists(_.startsWith("DELTA")),
        s"expected v2 DELTA encodings, got $encodings")
    } finally r.close()
    // settings persist in the catalog across re-attach
    val lake2 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    assert(lake2.options().toMap.get("parquet_version").contains("2"))
    assert(lake2.table("tbl").count() == 100000)
    // unsupported values error at SET time, like the reference
    intercept[IllegalArgumentException] {
      lake.setOption("parquet_compression", "zstdx")
    }
    intercept[IllegalArgumentException] {
      lake.setOption("parquet_version", "3")
    }
  }

  test("parquet_bloom_filter_columns writes real bloom filters") {
    val dir = Files.createTempDirectory("graftbloom").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    // high-cardinality values: parquet omits blooms for columns that
    // stay fully dictionary-encoded (the dictionary already filters)
    val df = (1 to 5000).map(i => (i.toLong, s"user_${i}_${"x" * 40}"))
      .toDF("id", "u")
    lake.createTable("t", df.schema)
    lake.setOption("parquet_bloom_filter_columns", "u:10000,id",
      table = Some("t"))
    lake.append("t", df.coalesce(1))
    assert(lake.table("t")
      .filter(org.apache.spark.sql.functions.col("u") ===
        s"user_3_${"x" * 40}")
      .count() == 1)
    // the footer must actually carry bloom filters for both columns
    val rel = lake.listFiles("t").select("data_file").head().getString(0)
    val file = lake.io.abs(rel)
    val conf = new org.apache.hadoop.conf.Configuration()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), conf))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val withBloom = (0 until cols.size()).map(cols.get)
        .filter(_.getBloomFilterOffset >= 0)
        .map(_.getPath.toDotString).toSet
      assert(withBloom == Set("u", "id"),
        s"expected bloom filters on u,id; found $withBloom")
    } finally reader.close()
  }

  test("require_commit_message gates data changes; settings() lists") {
    val dir = Files.createTempDirectory("graftopt3").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", Seq((1, "a")).toDF("id", "v"))
    lake.setOption("require_commit_message", "true")
    intercept[IllegalStateException] {
      lake.append("t", Seq((2, "b")).toDF("id", "v"))
    }
    lake.setCommitMessage("ci", "load batch 2")
    lake.append("t", Seq((2, "b")).toDF("id", "v"))
    assert(lake.table("t").count() == 2)
    // DDL (non-data) changes stay exempt, like the reference
    lake.addColumn("t", org.apache.spark.sql.types.StructField("x",
      org.apache.spark.sql.types.LongType))
    val s = lake.settings().collect().map(r => r.getString(0)).toSet
    assert(s.contains("require_commit_message") && s.contains("encrypted"))
  }

  test("commit audit trail: extra_info, last-set-wins, rollback discards") {
    // reference test/sql/audit/test_base_audit.test
    val dir = Files.createTempDirectory("graftopt5").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("t", Seq((1, "a")).toDF("id", "v"))

    // plain commits carry NULL author/message/extra_info
    val first = lake.snapshots().orderBy(org.apache.spark.sql.functions
      .col("snapshot_id").desc).limit(1).collect()(0)
    assert(first.isNullAt(first.fieldIndex("author")))
    assert(first.isNullAt(first.fieldIndex("commit_extra_info")))

    // last set_commit_message before the commit wins; extra_info lands in
    // commit_extra_info (with '' quote-escapes resolved)
    lake.begin()
    lake.sql("INSERT INTO t VALUES (2, 'b')")
    lake.sql("CALL set_commit_message('Pedro', 'bla')")
    lake.sql("CALL set_commit_message('Mark', 'Inserting Teddy', " +
      "extra_info=>'{''barks'':7}')")
    lake.commit()
    val snap = lake.snapshots().orderBy(org.apache.spark.sql.functions
      .col("snapshot_id").desc).limit(1).collect()(0)
    assert(snap.getAs[String]("author") == "Mark")
    assert(snap.getAs[String]("commit_message") == "Inserting Teddy")
    assert(snap.getAs[String]("commit_extra_info") == "{'barks':7}")

    // a rolled-back transaction discards its pending message
    lake.begin()
    lake.sql("INSERT INTO t VALUES (3, 'c')")
    lake.sql("CALL set_commit_message('Pedro', 'Adding Hannes')")
    lake.rollback()
    lake.append("t", Seq((3, "c")).toDF("id", "v"))
    val after = lake.snapshots().orderBy(org.apache.spark.sql.functions
      .col("snapshot_id").desc).limit(1).collect()(0)
    assert(after.isNullAt(after.fieldIndex("author")))
    assert(after.isNullAt(after.fieldIndex("commit_message")))

    // NULL author with a message; boolean option accepts True spelling
    lake.sql("CALL set_commit_message(NULL, 'Adding Mark')")
    lake.append("t", Seq((4, "d")).toDF("id", "v"))
    val m = lake.snapshots().orderBy(org.apache.spark.sql.functions
      .col("snapshot_id").desc).limit(1).collect()(0)
    assert(m.isNullAt(m.fieldIndex("author")))
    assert(m.getAs[String]("commit_message") == "Adding Mark")
    lake.sql("CALL set_option('require_commit_message', 'True')")
    val e = intercept[IllegalStateException] {
      lake.append("t", Seq((5, "e")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("Commit Information"))
    // set_commit_message with NULL fields still satisfies the gate: the
    // reference requires commit info to be *provided*, not non-NULL
    lake.sql("CALL set_commit_message(NULL, NULL)")
    lake.append("t", Seq((5, "e")).toDF("id", "v"))
    assert(lake.table("t").count() == 5)
  }

  test("hive_file_pattern=false writes flat files; pruning unaffected") {
    val dir = Files.createTempDirectory("graftopt4").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    import org.apache.spark.sql.functions.col
    lake.createTable("p", Seq((1L, "eu")).toDF("id", "region").schema)
    lake.setPartitionedBy("p", Seq(("region", "identity")))
    lake.setOption("hive_file_pattern", "false", table = Some("p"))
    lake.append("p", Seq((1L, "eu"), (2L, "us")).toDF("id", "region"))
    // no key=value dirs on disk
    val dirs = Files.walk(java.nio.file.Paths.get(s"$dir/data/p"))
      .filter(Files.isDirectory(_)).map[String](_.getFileName.toString)
      .toArray.map(_.toString)
    assert(!dirs.exists(_.contains("=")), dirs.mkString(","))
    // catalog partition values still prune
    assert(lake.table("p", Some(col("region") === "eu")).count() == 1)
    assert(lake.table("p").count() == 2)
  }

  test("per_thread_output=false writes one file per insert") {
    val dir = Files.createTempDirectory("graftopt5").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val df = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(8)
    lake.createTable("one", df.schema)
    lake.setOption("per_thread_output", "false", table = Some("one"))
    lake.append("one", df)
    assert(lake.listFiles("one").count() == 1)
    lake.createTable("many", df.schema)
    lake.append("many", df)
    assert(lake.listFiles("many").count() > 1)
  }

  test("scoped options are isolated per table") {
    val dir = Files.createTempDirectory("graftopt2").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("a", Seq((1, "x")).toDF("id", "v"))
    lake.createTableAs("b", Seq((1, "x")).toDF("id", "v"))
    lake.setOption("target_file_size", "1000", table = Some("a"))
    lake.setOption("target_file_size", "2000", table = Some("b"))
    val opts = lake.options()
    // both scoped rows survive (scope_id respected on upsert)
    assert(opts.count(_._1 == "target_file_size") == 2)
  }
}
