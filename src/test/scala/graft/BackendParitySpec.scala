package graft

import graft.catalog.SqliteCliCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Backend parity inside the suite: representative lake ORACLE queries
  * (not just unit DML) produce byte-identical results when every
  * throwaway lake runs on the live SQLite backend instead of Derby —
  * deletion vectors, rowid-preserving update, CDC and nested evolution
  * all read back the same through a different metadata engine. (The full
  * 30-oracle sweep on SQLite and PostgreSQL is the local
  * `SPARK_GRAFT_CATALOG` run recorded in SCALE.md; this pins a fast
  * subset in CI.) */
@org.scalatest.tags.Slow
class BackendParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val queries = Seq("lake_delete_dv", "lake_update",
    "lake_cdc_deletions", "lake_nested_evolution")

  private def canon(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect().map(_.toString).sorted.toSeq
  }

  private def withBackend[A](backend: String)(body: => A): A = {
    System.setProperty("graft.catalog", backend)
    try body finally System.clearProperty("graft.catalog")
  }

  for (q <- queries) test(s"$q: sqlite catalog result == derby result") {
    assume(SqliteCliCatalog.available, "no sqlite3 binary on this host")
    val derby = canon(q)
    val sqlite = withBackend("sqlite")(canon(q))
    assert(derby.size == sqlite.size,
      s"row counts differ: ${derby.size} vs ${sqlite.size}")
    assert(derby == sqlite)
  }

  test("postgres catalog result == derby result (lake_update)") {
    val base = PgTestServer.urlBase
    assume(base.isDefined, "no bootable PostgreSQL server on this host")
    val url = PgTestServer.freshDbUrl("parity").get
    val derby = canon("lake_update")
    val pg = withBackend(url)(canon("lake_update"))
    assert(derby == pg)
  }
}
