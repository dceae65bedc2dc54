package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // mirror Verify's session: DSv2 DDL catalog + lake SQL extensions so
    // queries like lake_sql_ctas run the same way the driver runs them
    .config("spark.sql.catalog.graft", "graft.sources.GraftTableCatalog")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()
}

/** Smoke-level checks for every declared query: runs on sf0.001, asserts
  * non-empty results and stable column sets (oracle hash-matching happens in
  * the driver's DuckDB compare; tools/check.py replicates it locally). */
class RelationalQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  for (pack <- SparkEntry.packs; q <- pack.queries) {
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned no rows at sf0.001")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
