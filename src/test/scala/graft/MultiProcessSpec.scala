package graft

import java.nio.file.Files

import scala.sys.process._

import graft.catalog._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS commit contention: the reference's optimistic protocol
  * is exercised by separate OS processes attached to one catalog
  * (test/sql/concurrent/); ConcurrencySpec's 20 writers share a JVM, so
  * this spec spawns real child JVMs ([[CommitHammer]], Spark-free) that
  * hammer one HTTP catalog service concurrently. Every commit races on
  * the snapshot-id PK across process boundaries; the conflict SQLSTATE
  * round-trips the wire and each loser retries with backoff. Zero lost
  * updates: all N×M rows present, N×M distinct snapshots committed. */
@org.scalatest.tags.Slow
class MultiProcessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("N child JVMs x M commits against one catalog: no lost updates") {
    val writers = 3
    val perWriter = 12
    val dir = Files.createTempDirectory("graftmp").toString
    val server = new HttpCatalogServer(
      MetadataManager.derbyUrl(s"$dir/cat")).start()
    try {
      val lake = Lake.attach(spark, server.url, s"$dir/data")
      lake.createTable("t", StructType(Seq(
        StructField("writer", LongType), StructField("seq", LongType))))
      val snap0 = lake.currentSnapshotId()

      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val cp = System.getProperty("java.class.path")
      val procs = (1 to writers).map { w =>
        Process(Seq(javaBin, "-cp", cp, "graft.CommitHammer",
          server.url, "t", w.toString, perWriter.toString)).run(
          ProcessLogger(line => info(s"[w$w] $line"),
            line => info(s"[w$w!] $line")))
      }
      val codes = procs.map(_.exitValue())
      assert(codes.forall(_ == 0), s"child exit codes: $codes")

      // zero lost updates: every (writer, seq) pair arrived exactly once
      val rows = lake.table("t")
        .select("writer", "seq").as[(Long, Long)].collect().toSeq
      assert(rows.size == writers * perWriter)
      assert(rows.toSet.size == writers * perWriter)
      assert(rows.toSet == (for {
        w <- 1 to writers; i <- 0 until perWriter
      } yield (w.toLong, i.toLong)).toSet)
      // one snapshot per commit — interleaved, none overwritten
      assert(lake.currentSnapshotId() == snap0 + writers * perWriter)

      // phase 2: two processes DELETE disjoint row sets concurrently —
      // both must fully land (no lost deletes), writer 3's rows survive
      val snap1 = lake.currentSnapshotId()
      val delProcs = (1 to 2).map { w =>
        Process(Seq(javaBin, "-cp", cp, "graft.CommitHammer",
          server.url, "t", w.toString, "0", "delete")).run(
          ProcessLogger(line => info(s"[d$w] $line"),
            line => info(s"[d$w!] $line")))
      }
      val delCodes = delProcs.map(_.exitValue())
      assert(delCodes.forall(_ == 0), s"delete child exit codes: $delCodes")
      val left = lake.table("t")
        .select("writer", "seq").as[(Long, Long)].collect().toSet
      assert(left == (0 until perWriter).map(i => (3L, i.toLong)).toSet)
      assert(lake.currentSnapshotId() == snap1 + 2 * perWriter)
      // time travel: pre-delete snapshot still shows all rows
      assert(lake.tableAtVersion("t", snap1).count() == writers * perWriter)
    } finally server.stop()
  }

  test("two child SPARK processes append real parquet to one lake") {
    val perWriter = 4
    val dir = Files.createTempDirectory("graftmps").toString
    val server = new HttpCatalogServer(
      MetadataManager.derbyUrl(s"$dir/cat")).start()
    try {
      val lake = Lake.attach(spark, server.url, s"$dir/data")
      lake.createTable("pq", StructType(Seq(
        StructField("writer", LongType), StructField("seq", LongType))))
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val cp = System.getProperty("java.class.path")
      // child JVMs boot their own SparkSession → need the JDK17 opens
      val opens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val procs = (1 to 2).map { w =>
        Process(Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp", cp,
          "graft.CommitHammer", server.url, "pq", w.toString,
          perWriter.toString, s"spark-append:$dir/data")).run(
          ProcessLogger(line => info(s"[s$w] $line"),
            line => info(s"[s$w!] $line")))
      }
      val codes = procs.map(_.exitValue())
      assert(codes.forall(_ == 0), s"spark child exit codes: $codes")
      val rows = lake.table("pq")
        .select("writer", "seq").as[(Long, Long)].collect().toSet
      assert(rows == (for {
        w <- 1 to 2; i <- 0 until perWriter
      } yield (w.toLong, i.toLong)).toSet)
      // rowids allocated across processes never collide (row_id_start is
      // re-read inside each retried commit body)
      assert(lake.tableWithRowId("pq").select("rowid").distinct()
        .count() == 2L * perWriter)
    } finally server.stop()
  }
}
