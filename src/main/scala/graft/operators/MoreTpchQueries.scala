package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import graft.QueryDsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining TPC-H query shapes (reference benchmark/tpch/q04..q22
  * adapted to the driver star schema): correlated EXISTS window (q4),
  * two-nation volume (q7), top-k revenue customers (q10), group HAVING
  * vs scalar subquery (q11), conditional-ratio aggregate (q14), IN over
  * grouped HAVING (q18). */
object MoreTpchQueries extends QueryPack {

  /** q4: priority histogram of orders with a qualifying lineitem. */
  private def q4(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(t.lineitem.filter(col("l_quantity") >= 48),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q7: cross-nation shipping volume by (supplier nation, customer
    * nation, year) — all distinct pairs so the query stays non-empty at
    * every scale factor. */
  private def q7(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val n = broadcast(t.nation)
    t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(n.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation")), col("s_nationkey") === col("sn_key"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(n.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation")), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q7Sql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  EXTRACT(year FROM l_shipdate) AS l_year,
       |  ${oRevenue("l_extendedprice", "l_discount")} AS volume
       |FROM lineitem, supplier, orders, customer, nation n1, nation n2
       |WHERE l_suppkey = s_suppkey AND s_nationkey = n1.n_nationkey
       |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND c_nationkey = n2.n_nationkey
       |  AND n1.n_name <> n2.n_name
       |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** q10: top-20 customers by returned-item revenue in a half-year. */
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.filter(col("l_returnflag") === "R")
      .join(t.orders.filter(
        col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    s"""SELECT c_custkey, c_name,
       |  ${oRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem, orders, customer
       |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
       |  AND o_custkey = c_custkey
       |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY c_custkey, c_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** q11: per-nation supplier balance share HAVING > 4% of the total.
    * Exact long sums both sides of the comparison. */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val joined = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
    val perNation = joined.groupBy(col("n_name"))
      .agg(sum(sl2(col("s_acctbal"))).as("bal2"))
    val total = joined.agg(sum(sl2(col("s_acctbal"))).as("tot2"))
    perNation.join(broadcast(total),
      col("bal2").cast("double") > col("tot2").cast("double") * 0.04)
      .select(col("n_name"), (col("bal2").cast("double") / 100.0).as("value"))
      .orderBy(col("value").desc, col("n_name"))
  }

  private val q11Sql = {
    val bal = s"SUM(${oSl2("s_acctbal")})"
    s"""WITH j AS (SELECT n_name, s_acctbal FROM supplier JOIN nation
       |  ON s_nationkey = n_nationkey)
       |SELECT n_name, CAST(CAST($bal AS BIGINT) AS DOUBLE) / 100.0 AS value
       |FROM j GROUP BY n_name
       |HAVING CAST(CAST($bal AS BIGINT) AS DOUBLE) >
       |  (SELECT CAST(CAST($bal AS BIGINT) AS DOUBLE) FROM j) * 0.04
       |ORDER BY value DESC, n_name""".stripMargin
  }

  /** q14: promo revenue share — ratio of two exact conditional sums. */
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val r = sl2(col("l_extendedprice")) * (lit(10000L) - sl4(col("l_discount")))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(broadcast(Tables(spark, dir).part),
        col("l_partkey") === col("p_partkey"))
      .agg(
        ((lit(100.0) * sum(when(col("p_type") === "PROMO", r).otherwise(0L))
          .cast("double")) / sum(r).cast("double")).as("promo_revenue"))
  }

  private val q14Sql = {
    val r = s"${oSl2("l_extendedprice")} * (10000 - ${oSl4("l_discount")})"
    s"""SELECT (100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $r ELSE 0 END) AS BIGINT) AS DOUBLE))
       |  / CAST(CAST(SUM($r) AS BIGINT) AS DOUBLE) AS promo_revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin
  }

  /** q18: large-volume orders (grouped HAVING feeding a semi join). */
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.lineitem.groupBy(col("l_orderkey"))
      .agg(lsum(sl2(col("l_quantity")), 100.0).as("sum_qty"))
      .filter(col("sum_qty") > 300.0)
    t.orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    s"""SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
       |FROM orders
       |JOIN (SELECT l_orderkey,
       |        ${oLsum(oSl2("l_quantity"), "100.0")} AS sum_qty
       |      FROM lineitem GROUP BY l_orderkey
       |      HAVING ${oLsum(oSl2("l_quantity"), "100.0")} > 300.0) big
       |  ON o_orderkey = big.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q4_priority", q4, Some(q4Sql)),
    QueryDef("q7_nation_volume", q7, Some(q7Sql)),
    QueryDef("q10_returned", q10, Some(q10Sql)),
    QueryDef("q11_balance_share", q11, Some(q11Sql)),
    QueryDef("q14_promo_share", q14, Some(q14Sql)),
    QueryDef("q18_large_orders", q18, Some(q18Sql)),
  )
}
