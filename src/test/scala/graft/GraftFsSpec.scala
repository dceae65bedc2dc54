package graft

import java.nio.file.Files

import graft.catalog.Lake
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lake I/O on a NON-default Hadoop FileSystem scheme. The reference runs
  * its suite against a real S3 backend (test/configs/minio.json,
  * test/sql/cloud/); without network, `graftfs:///` gives the same proof
  * shape: every data-path operation must go through the FileSystem API
  * (a `graftfs:///x` string is not a valid java.io path, so any direct
  * java.io/nio access fails immediately) and must survive object-store
  * semantics (no rename-overwrite, no append).
  */
class GraftFsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): (Lake, String) = {
    val dir = Files.createTempDirectory("graftfs").toString
    // catalog stays on the default scheme (it is JDBC, not FileSystem I/O);
    // the DATA path — every parquet/DV/delete file — lives on graftfs://
    (Lake.attach(spark, s"$dir/catalog", s"graftfs://$dir/data"), dir)
  }

  test("scheme registers from a bare Configuration (ServiceLoader)") {
    val fs = FileSystem.get(new java.net.URI("graftfs:///"),
      new Configuration())
    assert(fs.getScheme == "graftfs")
    assert(fs.isInstanceOf[graft.sources.GraftFileSystem])
  }

  test("graftfs rejects rename-overwrite and append (object-store " +
    "semantics)") {
    val fs = FileSystem.get(new java.net.URI("graftfs:///"),
      new Configuration())
    val dir = Files.createTempDirectory("graftfsraw").toString
    val a = new Path(s"graftfs://$dir/a")
    val b = new Path(s"graftfs://$dir/b")
    Seq(a, b).foreach { p =>
      val out = fs.create(p, true); out.write(1); out.close()
    }
    assert(!fs.rename(a, b), "rename onto an existing path must fail")
    intercept[UnsupportedOperationException](fs.append(a))
  }

  test("full lake lifecycle on graftfs://: roundtrip, delete, compact, " +
    "expire + cleanup") {
    val (lake, dir) = freshLake()
    // roundtrip (multiple appends = multiple data files)
    lake.createTableAs("t",
      (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    lake.append("t", (41L to 60L).map(i => (i, s"v$i")).toDF("id", "v"))
    lake.append("t", (61L to 80L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(lake.table("t").count() == 80)
    // stats-driven pruning reads footers through graftfs
    assert(lake.table("t").filter(col("id") === 77L).count() == 1)
    // delete → positional delete files written executor-side on graftfs
    lake.delete("t", col("id") % 10 === 0L)
    assert(lake.table("t").count() == 72)
    // compaction rewrites + rename on graftfs (no-overwrite semantics)
    lake.mergeAdjacentFiles("t")
    assert(lake.table("t").count() == 72)
    assert(lake.table("t").agg(sum(col("id"))).head().getLong(0) ==
      (1L to 80L).sum - (10L to 80L by 10).sum)
    // expire everything but the head, then physically remove old files
    lake.expireSnapshots(Some(System.currentTimeMillis() + 1000000))
    lake.cleanupOldFiles(Some(System.currentTimeMillis() + 1000000))
    assert(lake.table("t").count() == 72)
    // every surviving data file lives under the graftfs data root and is
    // enumerable through the FileSystem API
    val fs = FileSystem.get(new java.net.URI("graftfs:///"),
      new Configuration())
    val files = {
      val it = fs.listFiles(new Path(s"graftfs://$dir/data"), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) buf += it.next().getPath.toString
      buf.toSeq
    }
    assert(files.nonEmpty)
    assert(files.forall(_.startsWith("graftfs:/")), files.take(3))
    // time travel across the compaction still reads through graftfs
    val snaps = lake.snapshots().select("snapshot_id").collect()
      .map(_.getLong(0)).sorted
    assert(lake.tableAtVersion("t", snaps.last).count() == 72)
  }

  test("orphan sweep enumerates and deletes through graftfs") {
    val (lake, dir) = freshLake()
    lake.createTableAs("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // plant an orphan through the FileSystem API (not java.io)
    val fs = FileSystem.get(new java.net.URI("graftfs:///"),
      new Configuration())
    val orphan = new Path(s"graftfs://$dir/data/t/orphan.parquet")
    Seq((9L, "z")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"graftfs://$dir/data/_tmp_orphan")
    val src = fs.listStatus(new Path(s"graftfs://$dir/data/_tmp_orphan"))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    assert(fs.rename(src, orphan))
    val dry = lake.deleteOrphanedFiles("t", dryRun = true)
    assert(dry.exists(_.contains("orphan.parquet")), dry)
    lake.deleteOrphanedFiles("t")
    assert(!fs.exists(orphan))
    assert(lake.table("t").count() == 2)
  }
}
