package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import graft.QueryDsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining TPC-H query shapes (reference benchmark/tpch/q04..q22
  * adapted to the driver star schema) — together with RelationalQueries
  * every one of the 22 query patterns the reference benchmarks is
  * represented and oracle-checked: correlated EXISTS (q4), cross-nation
  * volume (q7), market-share ratio (q8), profit rollup (q9), top-k
  * revenue (q10), HAVING vs scalar subquery (q11), promo ratio (q14),
  * NOT-IN distinct counts (q16), per-group threshold (q17), grouped
  * HAVING join (q18), anti-self-join (q21), substring buckets + NOT
  * EXISTS (q22). */
object MoreTpchQueries extends QueryPack {

  /** q4: priority histogram of orders with a qualifying lineitem. */
  private def q4(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // EXISTS flipped into a map-side probe: the (orderkey, priority)
    // pairs of a 3-month orders slice are a CONSTANT FRACTION of orders
    // (3 of the ~79 generated months ≈ 3.8% — it GROWS linearly with
    // SF), broadcast into the fact scan — lineitem, the 60 M-row side,
    // never shuffles; the only exchange carries the DISTINCT surviving
    // pairs, bounded by the slice. A/B at factor 100 (bench_runs/README,
    // SCALE.md §13): this probe 0.42 s vs SMJ semi 0.73 s vs
    // shuffle_hash semi 1.15 s. boundedBroadcast: est = orders bytes/16
    // (slice ≈ 1/26 of rows, 2 of 4 columns — /16 keeps ~1.6× margin);
    // past the cap the hint drops and the join degrades to the measured
    // 0.73 s-class SMJ semi instead of an unbounded driver build.
    val ordSlice = t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    t.lineitem.filter(col("l_quantity") >= 48)
      .join(boundedBroadcast(ordSlice, t.bytesOf("orders") / 16),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .distinct()
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
    // Late materialization: c_name is functionally dependent on
    // c_custkey and customer⋈orders is a key-preserving FK join, so the
    // customer join COMMUTES with the top-20 — aggregate revenue by
    // o_custkey alone, TakeOrdered the 20 winners, then join just those
    // 20 rows against customer for the names. The naive shape shuffles
    // the whole customer table and carries c_name through the aggregate;
    // this shape's only wide op is the custkey aggregation. The fact
    // join takes the shuffled-hash hint (both inputs fact-derived, no
    // ordering needed downstream — the SMJ sorts are pure waste).
    val top = t.lineitem.filter(col("l_returnflag") === "R")
      .join(t.orders.filter(
        col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(20)
    t.customer
      .join(broadcast(top), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"))
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
      // broadcast — but ship ONLY the two columns the query touches:
      // (p_partkey, p_type) shrinks the build payload vs the full part
      // row. The shuffled-hash alternative (part grows with SF, so
      // "don't broadcast a growing side" is principled) was A/B'd at
      // factor 100 and LOST (0.41 s vs 0.34 s broadcast; 2.4 s worst
      // rep — SCALE.md §13): Spark's per-task UnsafeHashedRelation
      // build is no vectorized hash join, and the slim build side is
      // |part|-bounded, not fact-sized. boundedBroadcast (est = part's
      // on-disk bytes): where part outgrows the cap the hint drops and
      // the planner falls back to a shuffle join — an explicit hint
      // would otherwise pin the broadcast at EVERY scale (AQE does not
      // demote hints), OOMing the driver at 100 TB.
      .join(boundedBroadcast(t.part
          .select(col("p_partkey"), col("p_type")), t.bytesOf("part")),
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
    // The HAVING survivors are ~0.01% of orders at any SF, but with AQE
    // off the static planner cannot size an aggregate output, so both
    // joins would shuffle. Broadcast the survivors into the orders scan,
    // then broadcast the (now tiny) filtered orders into the customer
    // scan: zero shuffles after the one lineitem aggregation exchange.
    // The survivor count still GROWS linearly with SF, so the hints are
    // boundedBroadcast (est = orders bytes/100 — 100× margin over the
    // ~0.01% selectivity); past the cap both joins degrade to shuffles.
    val q18Est = t.bytesOf("orders") / 100
    val bigOrders = t.orders
      .join(boundedBroadcast(big, q18Est),
        col("o_orderkey") === col("l_orderkey"))
    boundedBroadcast(bigOrders, q18Est)
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

  /** q8: market-share ratio — one nation's share of total volume by year. */
  private def q8(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val r = sl2(col("l_extendedprice")) * (lit(10000L) - sl4(col("l_discount")))
    t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("n_name") === "NATION_3", r).otherwise(0L))
          .cast("double") / sum(r).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q8Sql = {
    val r = s"${oSl2("l_extendedprice")} * (10000 - ${oSl4("l_discount")})"
    s"""SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       |  CAST(CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN $r ELSE 0 END) AS BIGINT) AS DOUBLE)
       |    / CAST(CAST(SUM($r) AS BIGINT) AS DOUBLE) AS mkt_share
       |FROM lineitem, supplier, nation, orders
       |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  AND l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY o_year""".stripMargin
  }

  /** q9: profit by nation and year with a LIKE part filter. */
  private def q9(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      // part grows with SF: hint only while its footprint fits the cap
      .join(boundedBroadcast(t.part.filter(col("p_name").like("%a%")),
          t.bytesOf("part")),
        col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("sum_profit"))
      // output is nation × year (≤ a few hundred rows at ANY scale):
      // single-partition sort instead of a range exchange, whose
      // RangePartitioner sampling job re-executes the upstream agg
      .coalesce(1)
      .sortWithinPartitions(col("nation"), col("o_year").desc)
  }

  private val q9Sql =
    s"""SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       |  ${oRevenue("l_extendedprice", "l_discount")} AS sum_profit
       |FROM lineitem, part, supplier, nation, orders
       |WHERE l_partkey = p_partkey AND p_name LIKE '%a%'
       |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  AND l_orderkey = o_orderkey
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** q16: distinct supplier counts per part attribute with NOT IN. */
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val excluded = t.supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("x_suppkey"))
    // Pre-distinct the NARROW (partkey, suppkey) pair before anything
    // string-keyed touches the fact rows: the pair domain is bounded by
    // |partsupp| (fixed per part, like q17/q20's bounded aggregates)
    // while lineitem grows with SF, so the fact-wide stage dedups 60 M
    // rows to ~0.6 M pairs over two LONG keys — dense 16-byte hash-agg
    // buffers instead of the (brand, type, size, suppkey) string-keyed
    // distinct over every fact row, whose per-task table sat at the
    // execution-memory edge and tipped into sort-fallback spill
    // cascades (isolated min-of-9 7.2 s at factor 100; 2.7–10.4 s band
    // across runs). The part join and the attribute-keyed countDistinct
    // then run over the bounded pair set. Same values: the anti filter
    // is row-wise on suppkey, part⋈ is keyed by partkey alone, and
    // DISTINCT commutes with both.
    t.lineitem
      .join(excluded, col("l_suppkey") === col("x_suppkey"), "left_anti")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      // part grows with SF: hint only while its footprint fits the cap
      .join(boundedBroadcast(t.part.filter(col("p_brand") =!= "Brand#45"),
          t.bytesOf("part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(50)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey AND p_brand <> 'Brand#45'
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      |LIMIT 50""".stripMargin

  /** q17: small-quantity revenue vs per-part average threshold. */
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val avgQty = t.lineitem.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((lsum(sl2(col("l_quantity")), 100.0) / count(lit(1)) * 0.5)
        .as("half_avg"))
    t.lineitem
      // broadcast: the aggregate's output is bounded by |distinct
      // partkeys| ≤ |part| (two slim columns), but its PLAN-TIME size
      // estimate inherits lineitem's, so without AQE the planner picks a
      // sort-merge join that shuffles + sorts the whole fact side —
      // measured 10.5 s vs 0.9 s at factor 100 (25× vs DuckDB → ~2×).
      // boundedBroadcast fixes the estimate with problem knowledge
      // instead of pinning the hint at every scale: est = part's
      // on-disk bytes (the pair payload is narrower than a part row);
      // past the cap the hint drops and the plan degrades to the SMJ —
      // slow but finite, vs a |part|-sized driver build that grows
      // linearly with SF (AQE never demotes an explicit hint).
      .join(boundedBroadcast(avgQty, t.bytesOf("part")),
        col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg((lsum(sl2(col("l_extendedprice")), 100.0) / 7.0)
        .as("avg_yearly"))
  }

  private val q17Sql =
    s"""SELECT ${oLsum(oSl2("l_extendedprice"), "100.0")} / 7.0 AS avg_yearly
       |FROM lineitem l1
       |JOIN (SELECT l_partkey AS ap_partkey,
       |        ${oLsum(oSl2("l_quantity"), "100.0")} / COUNT(*) * 0.5 AS half_avg
       |      FROM lineitem GROUP BY l_partkey) a
       |  ON l1.l_partkey = a.ap_partkey
       |WHERE l1.l_quantity < a.half_avg""".stripMargin

  /** q21: suppliers with late lines where no other supplier shares the
    * order (EXISTS + NOT EXISTS pair). */
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // Anti-join formulation, kept after a losing A/B: "no OTHER supplier
    // on the same order" also collapses into one grouped aggregation
    // (min(l_suppkey)=max(l_suppkey) + a conditional count), which
    // shuffles ~one row per order instead of the fact table twice — but
    // measured at sf0.1/sf1/sf10 the aggregate LOSES at every scale
    // (0.141/0.229/2.65 s vs 0.046/0.077/2.4 s): hash-aggregating
    // millions of per-order groups costs more than the sort-merge anti
    // join, which streams over the orderkey-clustered layout with no
    // hash table at all. On an unclustered layout the aggregate
    // formulation would win; with sort-on-insert the join is the plan
    // you want.
    val l1 = t.lineitem.filter(col("l_quantity") >= 45)
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("sk1"))
    val others = t.lineitem
      .select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
    l1
      .join(others,
        col("k1") === col("k2") && col("sk1") =!= col("sk2"), "left_anti")
      .join(t.supplier, col("sk1") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** q21 with the q16 narrow-pair pre-pass (VERDICT r13 item 4): the
    * anti join's right side only matters as the SET of (orderkey,
    * suppkey) pairs — anti-join semantics ignore duplicates — so
    * DISTINCT the two-long pair before the join. The partial (map-side)
    * aggregate dedups before the exchange (guide §2.3 "aggregate before
    * you shuffle"), so the right side's exchange+sort shrink from
    * |lineitem| rows to |distinct pairs| — bounded by orders × suppliers
    * per order, and the 60 M-row sort whose per-task buffer drove the
    * 2.5–13 s factor-100 spill band disappears. Values identical at any
    * data: same oracle as q21_waiting. */
  private def q21Dedup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val l1 = t.lineitem.filter(col("l_quantity") >= 45)
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("sk1"))
    val others = t.lineitem
      .select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
      .distinct()
    l1
      .join(others,
        col("k1") === col("k2") && col("sk1") =!= col("sk2"), "left_anti")
      .join(t.supplier, col("sk1") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** q21 as ONE pass over lineitem: repartition by l_orderkey, sort
    * within, stream per-order O(1) state (first supplier, any-other
    * flag, count of qty≥45 rows) — an order waits iff it has exactly one
    * distinct supplier, and then EVERY qty≥45 row of it survives the
    * anti join, so emitting (supplier, count) per qualifying order is
    * row-for-row the anti-join semantics. Replaces the two fact passes +
    * SMJ anti (2 exchanges + 2 sorts) with 1 exchange + 1 sort + a
    * linear fold over InternalRow. Same oracle as q21_waiting.
    *
    * A/B VERDICT (r11, kept as the documented losing formulation like
    * the r10 grouped-aggregate attempt): LOSES at every scale — 0.233 vs
    * 0.113 s (sf0.1), 0.403 vs 0.167 (sf1), 5.40 vs 2.44 (sf10). The
    * interpreted per-row fold (branchy, ~|lineitem| iterations outside
    * codegen) costs more than the whole-stage-codegen'd SMJ streaming
    * over the orderkey-clustered layout, even though it does half the
    * exchanges and sorts. Lesson consistent across three q21 A/Bs now:
    * on this layout, staying inside codegen beats shuffling less. */
  private def q21Stream(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val n = spark.sessionState.conf.numShufflePartitions
    val base = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      .repartition(n, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    val out = base.queryExecution.toRdd.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
        import org.apache.spark.sql.catalyst.InternalRow
        import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
        private var hasPending = false
        private var pOrder = 0L
        private var pSupp = 0L
        private var pQty = 0.0
        locally {
          if (it.hasNext) {
            val r = it.next()
            pOrder = r.getLong(0); pSupp = r.getLong(1)
            pQty = r.getDouble(2); hasPending = true
          }
        }
        private var out0: InternalRow = _
        private var ready = false
        private def advance(): Unit = {
          while (hasPending && !ready) {
            val order = pOrder
            val supp = pSupp
            var multi = false
            var c45 = if (pQty >= 45.0) 1L else 0L
            hasPending = false
            var done = false
            while (!done && it.hasNext) {
              val r = it.next()
              val o = r.getLong(0)
              if (o == order) {
                if (r.getLong(1) != supp) multi = true
                if (r.getDouble(2) >= 45.0) c45 += 1L
              } else {
                pOrder = o; pSupp = r.getLong(1); pQty = r.getDouble(2)
                hasPending = true
                done = true
              }
            }
            if (!multi && c45 > 0L) {
              out0 = new GenericInternalRow(Array[Any](supp, c45))
              ready = true
            }
          }
        }
        override def hasNext: Boolean = { advance(); ready }
        override def next(): InternalRow = {
          advance()
          ready = false
          out0
        }
      }
    }
    val perOrder = org.apache.spark.sql.graftshim.ColumnBridge
      .ofInternalRows(spark, out,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("sk",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("c45",
            org.apache.spark.sql.types.LongType))))
    perOrder
      .join(boundedBroadcast(
          t.supplier.select(col("s_suppkey"), col("s_name")),
          t.bytesOf("supplier")),
        col("sk") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("c45")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_quantity >= 45
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** q22: acctbal of above-average customers with no orders, bucketed by
    * a name-derived code (substring + scalar subquery + NOT EXISTS). */
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val avgBal = t.customer.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("ab"))
    t.customer
      .join(broadcast(avgBal), col("c_acctbal") > col("ab"))
      // SMJ anti against the 1-URGENT orders slice — deliberately NOT
      // shuffled-hash: the hint was A/B'd at factor 100 and LOST
      // (0.37 s vs 0.11 s SMJ; SCALE.md §13). The sorts run over
      // already-shuffled slices and beat the per-task hash build+probe
      // at every measured scale.
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(substring(col("c_name"), 1, 10).as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        lsum(sl2(col("c_acctbal")), 100.0).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  private val q22Sql =
    s"""SELECT SUBSTR(c_name, 1, 10) AS cntrycode, COUNT(*) AS numcust,
       |  ${oLsum(oSl2("c_acctbal"), "100.0")} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
       |                   WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |                  AND o_orderpriority = '1-URGENT')
       |GROUP BY 1 ORDER BY cntrycode""".stripMargin

  /** q12: line-status priority counts over the orders⋈lineitem join in a
    * ship-year (reference benchmark/tpch/q12.benchmark; the driver schema
    * has no l_shipmode/l_commitdate, so l_linestatus stands in for the
    * mode bucket — same join + conditional-count shape). */
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val high = col("o_orderpriority").like("1-%") ||
      col("o_orderpriority").like("2-%")
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  private val q12Sql =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%' THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** q20: suppliers holding "excess supply" of a part family — the
    * dominant (max-quantity) supplier of some part (reference
    * benchmark/tpch/q20.benchmark; no partsupp table in the driver
    * schema, so per-(supplier,part) lineitem quantity stands in for
    * ps_availqty — same nested-aggregate + window + semi-join shape,
    * in exact scaled longs). */
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val parts = t.part.filter(col("p_name").like("small%"))
      .select(col("p_partkey"))
    val supply = t.lineitem
      // the small% slice grows with |part|: hint only under the cap
      .join(boundedBroadcast(parts, t.bytesOf("part")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      // ONE exchange for BOTH the (suppkey,partkey) aggregate and the
      // per-partkey window: hash-partitioning on l_partkey alone
      // satisfies the aggregate's clustered distribution (subset rule)
      // AND the window's, so the window's second all-to-all exchange of
      // the aggregated pairs disappears. The lost pre-shuffle combine is
      // noise: (suppkey,partkey) group fan-in is ~1, so partial agg
      // barely shrank the shuffle anyway.
      .repartition(col("l_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(sl2(col("l_quantity"))).as("qty2"))
    val excess = supply
      .withColumn("max2",
        max(col("qty2")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_partkey"))))
      .filter(col("qty2") === col("max2"))
    t.supplier
      // excess is BOUNDED by |small% parts| but inherits lineitem's
      // plan-time size estimate (the q17 lesson): without the hint the
      // semi join plans as a full shuffle+sort of supplier.
      // boundedBroadcast, est = part's on-disk bytes (gross
      // overestimate: excess is one long column over the small% subset)
      // — |part| still grows with SF, so past the cap the hint drops
      // rather than pinning a linearly growing driver build.
      .join(boundedBroadcast(excess.select(col("l_suppkey")),
          t.bytesOf("part")),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  private val q20Sql =
    s"""WITH supply AS (
       |  SELECT l_suppkey, l_partkey, SUM(${oSl2("l_quantity")}) AS qty2
       |  FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
       |  GROUP BY l_suppkey, l_partkey),
       |excess AS (
       |  SELECT l_suppkey FROM (
       |    SELECT l_suppkey, qty2, MAX(qty2) OVER (PARTITION BY l_partkey) AS max2
       |    FROM supply) s
       |  WHERE qty2 = max2)
       |SELECT s_name, s_acctbal FROM supplier
       |WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
       |ORDER BY s_name""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q4_priority", q4, Some(q4Sql)),
    QueryDef("q12_linestatus", q12, Some(q12Sql)),
    QueryDef("q20_excess_supply", q20, Some(q20Sql)),
    QueryDef("q8_market_share", q8, Some(q8Sql)),
    QueryDef("q9_profit", q9, Some(q9Sql)),
    QueryDef("q16_supplier_cnt", q16, Some(q16Sql)),
    QueryDef("q17_small_qty", q17, Some(q17Sql)),
    QueryDef("q21_waiting", q21, Some(q21Sql)),
    QueryDef("q21_stream", q21Stream, Some(q21Sql)),
    QueryDef("q21_dedup", q21Dedup, Some(q21Sql)),
    QueryDef("q22_acctbal", q22, Some(q22Sql)),
    QueryDef("q7_nation_volume", q7, Some(q7Sql)),
    QueryDef("q10_returned", q10, Some(q10Sql)),
    QueryDef("q11_balance_share", q11, Some(q11Sql)),
    QueryDef("q14_promo_share", q14, Some(q14Sql)),
    QueryDef("q18_large_orders", q18, Some(q18Sql)),
  )
}
