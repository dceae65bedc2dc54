package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import graft.QueryDsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subquery decorrelation + multiset set-op + lateral surface — engine
  * shapes the reference exercises through DuckDB's sqllogictest corpus
  * against a DuckLake attach (reference test/configs/attach_ducklake.json;
  * scalar/EXISTS subqueries and set ops run in every TPC-H/PG-regress
  * category). Spark-first expression: correlated scalar subqueries are
  * written as their decorrelated join form (what both optimizers produce),
  * so the plan is one aggregation + one broadcast/shuffle join instead of
  * a per-row re-scan.
  */
object SubqueryQueries extends QueryPack {

  /** TPC-H q17 shape: correlated scalar AGGREGATE subquery — lineitems
    * under 20% of their part's average quantity. Decorrelated: per-part
    * averages are ONE aggregation (sub-percent of lineitem cardinality),
    * joined back broadcast; at 100 TB the alternative per-row subquery
    * would be a second full scan per row. avg(l_quantity) is exact in
    * double (integer-valued, < 2^53), so both engines agree bitwise. */
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val thresh = t.lineitem.groupBy(col("l_partkey").as("t_partkey"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_thresh"))
    t.lineitem
      // part grows with SF: hint only while its footprint fits the cap
      .join(boundedBroadcast(t.part.filter(col("p_size") < 5),
          t.bytesOf("part")),
        col("l_partkey") === col("p_partkey"))
      .join(thresh, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg((lsum(sl2(col("l_extendedprice")), 100.0) / 7.0).as("avg_yearly"))
  }

  private val q17Sql =
    s"""SELECT ${oLsum(oSl2("l_extendedprice"), "100.0")} / 7.0 AS avg_yearly
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey AND p_size < 5
       |  AND l_quantity < (
       |    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
       |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** Scalar (uncorrelated) aggregate subquery: orders priced above the
    * global average, counted per priority. The comparison is done in
    * exact integers — sl2(price) * N > Σ sl2(price) — so the threshold
    * is bit-identical across engines. Spark: the one-row aggregate
    * broadcasts into the filter (no per-row recompute). */
  private def qScalarAvg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val g = t.orders.agg(sum(sl2(col("o_totalprice"))).as("tot"),
      count(lit(1)).as("n"))
    t.orders.join(broadcast(g))
      .filter(sl2(col("o_totalprice")) * col("n") > col("tot"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("o_orderpriority"))
  }

  private val qScalarAvgSql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_above
       |FROM orders
       |WHERE ${oSl2("o_totalprice")} * (SELECT COUNT(*) FROM orders)
       |    > (SELECT SUM(${oSl2("o_totalprice")}) FROM orders)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** EXISTS decorrelation → left-semi join: suppliers with at least one
    * high-discount 1997 shipment. */
  private def qExists(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val hot = t.lineitem.filter(
      col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") > 0.05)
    t.supplier.join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  private val qExistsSql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_discount > 0.05)
      |ORDER BY s_suppkey""".stripMargin

  /** NOT EXISTS decorrelation → left-anti join: customers with no orders,
    * counted per nation (the reference's NOT MATCHED / anti shapes). */
  private def qNotExists(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val q1_1995 = t.orders.filter(
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    t.customer
      .join(q1_1995, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_quiet"))
      .orderBy(col("c_nationkey"))
  }

  private val qNotExistsSql =
    """SELECT c_nationkey, COUNT(*) AS n_quiet FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** INTERSECT ALL — multiset semantics (duplicates kept up to the min
    * multiplicity): customers' order-months present in BOTH 1995 and
    * 1996 with the same per-month multiplicity floor. Spark implements
    * multiset intersection natively (intersectAll → a count-min
    * aggregation, one shuffle per side). */
  private def qIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def keys(yr: Int) = t.orders
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey"), month(col("o_orderdate")).cast("long").as("m"))
    keys(1995).intersectAll(keys(1996))
      .groupBy(col("m")).agg(count(lit(1)).as("n"))
      .orderBy(col("m"))
  }

  private val qIntersectAllSql =
    """SELECT m, COUNT(*) AS n FROM (
      |  SELECT o_custkey, CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m
      |  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
      |  INTERSECT ALL
      |  SELECT o_custkey, CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m
      |  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
      |GROUP BY m ORDER BY m""".stripMargin

  /** EXCEPT ALL — multiset difference, same shape. */
  private def qExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def keys(yr: Int) = t.orders
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey"), month(col("o_orderdate")).cast("long").as("m"))
    keys(1995).exceptAll(keys(1996))
      .groupBy(col("m")).agg(count(lit(1)).as("n"))
      .orderBy(col("m"))
  }

  private val qExceptAllSql =
    """SELECT m, COUNT(*) AS n FROM (
      |  SELECT o_custkey, CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m
      |  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
      |  EXCEPT ALL
      |  SELECT o_custkey, CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m
      |  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
      |GROUP BY m ORDER BY m""".stripMargin

  /** Lateral unnest over a computed list (DuckDB `unnest(str_split(…))`
    * ↔ Spark `explode(split(…))`): token frequency over documents,
    * top 20. Map-side explode + partial count — no row blow-up crosses
    * the exchange beyond distinct tokens. */
  private def qUnnestTokens(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 3)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)
  }

  private val qUnnestTokensSql =
    """SELECT tok, COUNT(*) AS n FROM (
      |  SELECT unnest(str_split(text, ' ')) AS tok FROM documents)
      |WHERE length(tok) > 3
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q17_avg_qty_subq", q17, Some(q17Sql)),
    QueryDef("q_scalar_avg_subq", qScalarAvg, Some(qScalarAvgSql)),
    QueryDef("q_exists_semi", qExists, Some(qExistsSql)),
    QueryDef("q_not_exists_anti", qNotExists, Some(qNotExistsSql)),
    QueryDef("q_intersect_all", qIntersectAll, Some(qIntersectAllSql)),
    QueryDef("q_except_all", qExceptAll, Some(qExceptAllSql)),
    QueryDef("q_unnest_tokens", qUnnestTokens, Some(qUnnestTokensSql)),
  )
}
