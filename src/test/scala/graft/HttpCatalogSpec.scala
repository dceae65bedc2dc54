package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import graft.catalog._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Quack-style HTTP catalog transport: the lake's metadata SQL ships to a
  * catalog service over HTTP while data files go straight to storage —
  * the reference's quack metadata backend re-expressed
  * (quack_metadata_manager.cpp query-by-name passthrough). */
class HttpCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("full lake round trip over the HTTP catalog service") {
    val dir = Files.createTempDirectory("grafthttp").toString
    val server = new HttpCatalogServer(
      MetadataManager.derbyUrl(s"$dir/cat")).start()
    try {
      assert(server.url.contains("dialect=derby"))
      val lake = Lake.attach(spark, server.url, s"$dir/data")
      lake.createTable("t", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      lake.append("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
      assert(lake.table("t").count() == 3)
      lake.delete("t", col("id") === 2L)
      assert(lake.table("t").select("id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 3L))
      // snapshots + time travel resolve through the service
      val snaps = lake.snapshots().count()
      assert(snaps >= 3) // create, append, delete
      assert(lake.tableAtVersion("t", 2).count() == 3)

      // a SECOND client of the same service sees committed state — the
      // shared-catalog deployment the HTTP backend exists for
      val lake2 = Lake.attach(spark, server.url, s"$dir/data")
      assert(lake2.table("t").count() == 2)
      lake2.append("t", Seq((9L, "z")).toDF("id", "v"))
      assert(lake.table("t").count() == 3)
    } finally server.stop()
  }

  test("optimistic-commit retry works over HTTP (SQLSTATE round trip)") {
    val dir = Files.createTempDirectory("grafthttpc").toString
    val server = new HttpCatalogServer(
      MetadataManager.derbyUrl(s"$dir/cat")).start()
    try {
      val lake = Lake.attach(spark, server.url, s"$dir/data")
      lake.createTable("c", StructType(Seq(StructField("id", LongType))))
      // concurrent appends race on the snapshot-id PK; the loser must see
      // a conflict SQLSTATE through the transport and retry to success
      val futures = (1 to 4).map(i => Future {
        lake.append("c", Seq(i.toLong).toDF("id"))
      })
      Await.result(Future.sequence(futures), 120.seconds)
      assert(lake.table("c").count() == 4)
      assert(lake.currentSnapshotId() >= 5)
    } finally server.stop()
  }

  test("unreachable service fails with a transport SQLSTATE, not a hang") {
    val e = intercept[Exception] {
      // nothing listens on this port; client retries then gives up
      new MetadataManager("http://127.0.0.1:1/catalog").currentSnapshot()
    }
    def states(t: Throwable): Seq[String] = t match {
      case null => Nil
      case s: java.sql.SQLException =>
        Option(s.getSQLState).toSeq ++ states(s.getCause)
      case other => states(other.getCause)
    }
    assert(states(e).contains("08001"), s"unexpected failure: $e")
  }
}
