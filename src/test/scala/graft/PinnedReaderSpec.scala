package graft

import java.nio.file.Files

import scala.sys.process._

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A reader in ANOTHER PROCESS pinned at an old snapshot survives the
  * owner's full maintenance pass (flush-inlined → expire → compact →
  * cleanup) because physical deletes are deferred by the
  * `delete_older_than` retention guard (reference
  * ducklake_cleanup_files.cpp:66-177: cleanup only removes scheduled
  * files older than the bound, so in-flight cross-process scans keep
  * their files). The same sequence with the guard dropped then really
  * does delete the files — proving deferral was the only protection. */
class PinnedReaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cross-process pinned reader's hash is stable across " +
    "flush -> expire -> compact -> cleanup, then breaks once the " +
    "retention guard is lifted") {
    val dir = Files.createTempDirectory("graftpin").toString
    val server = new HttpCatalogServer(
      MetadataManager.derbyUrl(s"$dir/cat")).start()
    try {
      val lake = Lake.attach(spark, server.url, s"$dir/data")
      // history: several small files + a delete + inlined rows
      lake.createTableAs("t",
        (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
      lake.append("t", (41L to 60L).map(i => (i, s"v$i")).toDF("id", "v"))
      lake.delete("t", col("id") % 7 === 0)
      lake.setOption("data_inlining_row_limit", "100")
      lake.append("t", (61L to 70L).map(i => (i, s"v$i")).toDF("id", "v"))
      val pinned = lake.currentSnapshotId()
      // post-pin history the reader must NOT see
      lake.setOption("data_inlining_row_limit", "0")
      lake.append("t", (71L to 80L).map(i => (i, s"v$i")).toDF("id", "v"))
      lake.delete("t", col("id") > 75L)

      // child JVM: Spark reader pinned at `pinned`
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val cp = System.getProperty("java.class.path")
      val opens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val sawHash0 = new java.util.concurrent.CountDownLatch(1)
      val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val proc = Process(Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.CommitHammer", server.url, "t", "1", "0",
        s"pinned-read:$dir/data|$pinned")).run(
        ProcessLogger({ line =>
          lines.add(line)
          if (line.startsWith("PIN-HASH0")) sawHash0.countDown()
        }, line => info(s"[pin!] $line")))
      assert(sawHash0.await(120, java.util.concurrent.TimeUnit.SECONDS),
        s"child never hashed: ${lines.toArray.mkString("; ")}")

      // owner maintenance WITH the retention guard: physical deletes of
      // anything scheduled in the last 10 minutes are deferred
      lake.setOption("delete_older_than", (10 * 60 * 1000L).toString)
      lake.flushInlinedData("t")
      // expire only history strictly BEFORE the pinned snapshot
      lake.expireSnapshots(versions = (1L until pinned))
      lake.mergeAdjacentFiles("t", 512L * 1024 * 1024)
      val deferred = lake.cleanupOldFiles(None)
      assert(deferred.isEmpty,
        s"retention guard should defer physical deletes, removed: $deferred")

      // signal the child to re-read and compare
      Files.write(java.nio.file.Paths.get(dir, "go"),
        Array.emptyByteArray)
      assert(proc.exitValue() == 0,
        s"pinned reader failed: ${lines.toArray.mkString("; ")}")
      val hashes = lines.toArray.map(String.valueOf(_))
        .filter(_.startsWith("PIN-HASH")).toSeq
      assert(hashes.size == 2 &&
        hashes.head.split(' ')(1) == hashes(1).split(' ')(1), hashes)

      // guard lifted: the same cleanup now really deletes files...
      lake.expireSnapshots(versions = pinned until lake.currentSnapshotId())
      val deleted =
        lake.cleanupOldFiles(Some(System.currentTimeMillis() + 1000))
      assert(deleted.nonEmpty, "expected physical deletes once unguarded")
      // ...and the pinned version is gone with its snapshot
      intercept[Exception](lake.tableAtVersion("t", pinned).collect())
    } finally server.stop()
  }
}
