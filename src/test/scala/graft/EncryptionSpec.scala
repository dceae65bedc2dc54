package graft

import java.nio.file.{Files, Paths}

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet modular encryption (reference "encrypted" lake option,
  * ducklake_storage.cpp:32): data + delete files are written with
  * encrypted footers, the master key lives only in the catalog DB, and a
  * plain parquet reader cannot open the files. */
class EncryptionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("encrypted lake round-trip; raw files unreadable without the key") {
    val dir = Files.createTempDirectory("graftenc").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.setOption("encrypted", "true")
    lake.createTableAs("sec",
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(lake.table("sec").count() == 100)

    // the parquet file on disk must not open without decryption props
    val file = Files.walk(Paths.get(s"$dir/data/sec"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val ex = intercept[Exception] {
      spark.read.parquet(file.toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m =>
      m.contains("encrypted footer") || m.contains("keys available") ||
        m.contains("crypto")), s"unexpected error: $ex")

    // DML over encrypted files: delete writes an encrypted delete file
    lake.delete("sec", col("id") % 2 === 0)
    assert(lake.table("sec").count() == 50)
    assert(lake.tableWithRowId("sec").select("rowid").distinct().count()
      == 50)

    // fresh attach (new Lake instance) finds the master key in the catalog
    val lake2 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    assert(lake2.table("sec").count() == 50)

    // compaction reads + rewrites encrypted
    lake2.append("sec", Seq((1000L, "x")).toDF("id", "v"))
    lake2.mergeAdjacentFiles("sec")
    assert(lake2.table("sec").count() == 51)

    // foreign plaintext files are rejected
    intercept[IllegalArgumentException] {
      lake2.addDataFiles("sec", Seq("/tmp/nonexistent.parquet"))
    }
  }
}
