package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live PostgreSQL catalog backend (reference
  * src/include/metadata_manager/postgres_metadata_manager.hpp:15-41 +
  * test/configs/postgres.json): the Postgres-dialect SQL — DOUBLE
  * PRECISION spelling, 63-char identifiers, MVCC conflict states — runs
  * against a REAL PostgreSQL server (throwaway cluster, psql CLI behind
  * [[PostgresCliCatalog]]'s Connection facade), the reference's headline
  * shared multi-writer deployment shape. */
@org.scalatest.tags.Slow
class PostgresCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val url = PgTestServer.freshDbUrl("cat")
    assume(url.isDefined, "no bootable PostgreSQL server on this host")
    val dir = java.nio.file.Files.createTempDirectory("graftpgdata").toString
    Lake.attach(spark, url.get, s"$dir/data")
  }

  test("attach routes jdbc:postgresql: to the Postgres dialect and a " +
    "real server") {
    val lake = freshLake()
    assert(lake.meta.dialect == PostgresDialect)
    assert(lake.currentSnapshotId() == 0L)
  }

  test("full DML round trip on a Postgres catalog") {
    val lake = freshLake()
    lake.createTableAs("t",
      (1L to 30L).map(i => (i, s"v$i", i * 1.5)).toDF("id", "v", "x"))
    lake.append("t", Seq((31L, "v31", 46.5)).toDF("id", "v", "x"))
    lake.delete("t", col("id") % 5 === 0L)
    lake.update("t", Map("v" -> lit("ONE")), col("id") === 1L)
    val rows = lake.table("t").select("id", "v").as[(Long, String)]
      .collect().toMap
    assert(rows.size == 25)
    assert(rows(1L) == "ONE")
    assert(!rows.contains(10L))
    val snaps = lake.snapshots().select("snapshot_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(snaps.head == 0L && snaps.size >= 5 &&
      snaps.last == lake.currentSnapshotId(), snaps)
    assert(lake.tableAtVersion("t", snaps.last - 2).count() == 31)
    // per-file min/max stats round-trip through DOUBLE PRECISION columns
    assert(lake.table("t").filter(col("id") === 31L).count() == 1)
  }

  test("multi-statement transaction commits as ONE snapshot; " +
    "a failed statement inside a txn does not poison it (autosave)") {
    val lake = freshLake()
    lake.createTableAs("t", Seq((1L, "a")).toDF("id", "v"))
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.append("t", Seq((2L, "b")).toDF("id", "v"))
      // a duplicate-table create fails INSIDE the transaction; Postgres
      // aborts the server txn on error, so without per-statement
      // savepoints the next append would die with 25P02
      intercept[IllegalArgumentException](
        lake.createTableAs("t", Seq((9L, "x")).toDF("id", "v")))
      lake.append("t", Seq((3L, "c")).toDF("id", "v"))
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("t").count() == 3)
    intercept[RuntimeException](lake.transaction {
      lake.append("t", Seq((4L, "d")).toDF("id", "v"))
      throw new RuntimeException("boom")
    })
    assert(lake.table("t").count() == 3)
  }

  test("concurrent commits: MVCC unique-violation on the snapshot PK " +
    "retries; no update lost") {
    val url = PgTestServer.freshDbUrl("conc")
    assume(url.isDefined, "no bootable PostgreSQL server on this host")
    val dir = java.nio.file.Files.createTempDirectory("graftpgc").toString
    val lake = Lake.attach(spark, url.get, s"$dir/data")
    lake.createTableAs("t", Seq((0L, 0L)).toDF("w", "i"))
    val writers = 3
    val per = 8
    val pool = Executors.newFixedThreadPool(writers)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val snap0 = lake.currentSnapshotId()
    val fs = (1 to writers).map { w =>
      Future {
        val m = new MetadataManager(url.get)
        val t = m.tableByName("t", m.currentSnapshot().snapshotId).get
        (0 until per).foreach { i =>
          m.appendInlined(t.tableId, Seq(s"""{"w":$w,"i":$i}"""))
        }
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    pool.shutdown()
    assert(lake.currentSnapshotId() == snap0 + writers * per)
    assert(lake.table("t").count() == 1 + writers * per)
  }

  test("two child JVMs commit against one Postgres database: the " +
    "reference's shared multi-writer deployment shape, no lost updates") {
    val url = PgTestServer.freshDbUrl("mp")
    assume(url.isDefined, "no bootable PostgreSQL server on this host")
    val writers = 2
    val per = 6
    val dir = java.nio.file.Files.createTempDirectory("graftpgmp").toString
    val lake = Lake.attach(spark, url.get, s"$dir/data")
    lake.createTableAs("t", Seq((0L, 0L)).toDF("w", "i"))
    val snap0 = lake.currentSnapshotId()
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val procs = (1 to writers).map { w =>
      scala.sys.process.Process(Seq(javaBin, "-cp", cp,
        "graft.CommitHammer", url.get, "t", w.toString, per.toString)).run(
        scala.sys.process.ProcessLogger(line => info(s"[w$w] $line"),
          line => info(s"[w$w!] $line")))
    }
    val codes = procs.map(_.exitValue())
    assert(codes.forall(_ == 0), s"child exit codes: $codes")
    assert(lake.currentSnapshotId() == snap0 + writers * per)
    assert(lake.table("t").count() == 1 + writers * per)
  }

  test("identifier limit: 63-char NAMEDATALEN enforced before the server " +
    "would silently truncate") {
    val lake = freshLake()
    intercept[IllegalArgumentException](
      lake.meta.dialect.checkIdentifier("t" * 64))
    lake.meta.dialect.checkIdentifier("t" * 63)
  }

  test("compaction child JVM races the parent's deletes on live " +
    "Postgres: losers conflict-and-retry, nothing resurrects") {
    val url = PgTestServer.freshDbUrl("race")
    assume(url.isDefined, "no bootable PostgreSQL server on this host")
    val dir = java.nio.file.Files.createTempDirectory("graftpgrace").toString
    val lake = Lake.attach(spark, url.get, s"$dir/data")
    lake.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    (0 until 12).foreach(k =>
      lake.append("t", (k * 10L until (k + 1) * 10L).toDF("id").coalesce(1)))
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
    val child = scala.sys.process.Process(
      Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.CommitHammer", url.get, "t", "1", "12",
        s"spark-compact:$dir/data")).run(
      scala.sys.process.ProcessLogger(line => info(s"[compactor] $line"),
        line => info(s"[compactor!] $line")))
    // parent deletes one key at a time while the child compacts; a delete
    // whose file was compacted away since planning conflicts → replan
    var parentConflicts = 0
    (0L until 60L).foreach { k =>
      var done = false
      var attempts = 0
      while (!done) {
        try { lake.delete("t", col("id") === k); done = true }
        catch {
          case _: CommitConflictException if attempts < 20 =>
            parentConflicts += 1; attempts += 1; Thread.sleep(50)
        }
      }
    }
    assert(child.exitValue() == 0, "compactor child failed")
    info(s"parent saw $parentConflicts delete conflicts")
    // every delete landed exactly once, none resurrected by a compaction
    assert(lake.table("t").count() == 60)
    assert(lake.table("t").agg(sum(col("id"))).head().getLong(0) ==
      (60L until 120L).sum)
    // losers' abandoned merged files are orphans the sweep can remove
    lake.deleteOrphanedFiles("t"): Unit
    assert(lake.table("t").count() == 60)
  }
}
