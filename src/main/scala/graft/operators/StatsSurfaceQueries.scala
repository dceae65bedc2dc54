package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical / type-surface breadth, second helping: variance-family
  * aggregates, higher moments, TRY_CAST, edit distance, UNION BY NAME,
  * entropy, discrete percentiles, and MAP / BLOB columns stored THROUGH
  * the lake (reference test/sql/types/map.test, all_types.test; the
  * aggregate shapes mirror sqllogictest categories the reference re-runs
  * against a DuckLake attach).
  *
  * Cross-engine determinism rules (same as QueryDsl): double STREAMING
  * aggregates (stddev/corr/skewness) are not bit-reproducible across
  * engines, so each query either (a) rounds to a tolerance far wider than
  * the summation noise, or (b) recomputes the statistic from EXACT integer
  * power sums with an identical IEEE expression tree on both sides and
  * asserts the native aggregate agrees within 1e-9 as a boolean — so the
  * engine-specific accumulation never reaches the hash compare, but a
  * broken aggregate flips the boolean.
  */
object StatsSurfaceQueries extends QueryPack {

  import LakeQueries.{detached, freshLake}

  /** Variance family + correlation (DuckDB stddev_samp/var_pop/corr).
    * The hash-compared values come from EXACT integer power sums
    * (l_quantity is integral; l_extendedprice has exactly 2 dp so ×100 is
    * an exact integer; price sums go through DECIMAL(38,0)/HUGEINT so no
    * long overflow at any SF), then one identical IEEE expression tree —
    * sqrt/div/mul only, all correctly rounded — on both sides. The
    * engines' native streaming aggregates (order-dependent accumulation)
    * never reach the hash: they are asserted against the exact value
    * within 1e-9 relative as booleans (the qSkewKurt pattern). */
  private def qStatsAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val q = col("l_quantity").cast("long")
    val pc = round(col("l_extendedprice") * lit(100), 0).cast("long")
    val g = t.lineitem.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(q).as("s1"),
      sum(q * q).as("s2"),
      sum(pc.cast("decimal(38,0)")).as("p1"),
      sum((pc * pc).cast("decimal(38,0)")).as("p2"),
      sum((q * pc).cast("decimal(38,0)")).as("pq"),
      stddev_samp(col("l_quantity")).as("sd_nat"),
      var_pop(col("l_quantity")).as("vp_nat"),
      corr(col("l_quantity"), col("l_extendedprice")).as("corr_nat"))
    val nd = col("n").cast("double")
    val Seq(s1, s2, p1, p2, pq) =
      Seq("s1", "s2", "p1", "p2", "pq").map(c => col(c).cast("double"))
    val m2q = s2 - s1 * s1 / nd
    val sd = sqrt(m2q / (nd - lit(1.0)))
    val vp = m2q / nd
    // corr is scale-invariant, so computing it on exact cents matches the
    // native corr on dollars (within the boolean tolerance)
    val cr = (pq - s1 * p1 / nd) /
      sqrt((s2 - s1 * s1 / nd) * (p2 - p1 * p1 / nd))
    def ok(nat: Column, exact: Column): Column =
      abs(nat - exact) <= lit(1e-9) * (abs(exact) + lit(1.0))
    g.select(col("l_returnflag"), sd.as("sd_qty"), vp.as("vp_qty"),
        cr.as("corr_qp"), col("n"),
        ok(col("sd_nat"), sd).as("sd_ok"), ok(col("vp_nat"), vp).as("vp_ok"),
        ok(col("corr_nat"), cr).as("corr_ok"))
      .orderBy(col("l_returnflag"))
  }

  private val qStatsAggSql =
    """WITH g AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
      |    CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)) AS DOUBLE) AS p1,
      |    CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT)*CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)) AS DOUBLE) AS p2,
      |    CAST(SUM(CAST(CAST(l_quantity AS BIGINT)*CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)) AS DOUBLE) AS pq
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |  SQRT((s2 - s1*s1/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE)-1.0)) AS sd_qty,
      |  (s2 - s1*s1/CAST(n AS DOUBLE))/CAST(n AS DOUBLE) AS vp_qty,
      |  (pq - s1*p1/CAST(n AS DOUBLE))
      |    / SQRT((s2 - s1*s1/CAST(n AS DOUBLE))*(p2 - p1*p1/CAST(n AS DOUBLE)))
      |    AS corr_qp,
      |  n, TRUE AS sd_ok, TRUE AS vp_ok, TRUE AS corr_ok
      |FROM g ORDER BY l_returnflag""".stripMargin

  /** Higher moments. The hash-compared skew/kurt values come from EXACT
    * integer power sums (l_quantity is integral 1..50, so q, q², q³, q⁴
    * are exact longs and their sums are exact — order-independent), then
    * one identical double expression tree on both sides. Spark's native
    * skewness()/kurtosis() (population g1 / excess g2, streaming central
    * moments) are asserted against the exact value as booleans. */
  private def qSkewKurt(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val q = col("l_quantity")
    val g = t.lineitem.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(q.cast("long")).as("s1"),
      sum((q * q).cast("long")).as("s2"),
      sum((q * q * q).cast("long")).as("s3"),
      sum((q * q * q * q).cast("long")).as("s4"),
      skewness(q).as("sk_nat"),
      kurtosis(q).as("ku_nat"))
    val n = col("n").cast("double")
    val Seq(s1, s2, s3, s4) =
      Seq("s1", "s2", "s3", "s4").map(c => col(c).cast("double"))
    val mean = s1 / n
    val m2 = s2 - s1 * s1 / n
    val m3 = s3 - lit(3.0) * mean * s2 + lit(2.0) * n * mean * mean * mean
    val m4 = s4 - lit(4.0) * mean * s3 + lit(6.0) * mean * mean * s2 -
      lit(3.0) * n * mean * mean * mean * mean
    // m2·sqrt(m2) = m2^1.5 from exactly-rounded IEEE ops — pow() is NOT
    // correctly rounded and differs in the last ulp across libms
    val sk = sqrt(n) * m3 / (m2 * sqrt(m2))
    val ku = n * m4 / (m2 * m2) - lit(3.0)
    def ok(nat: Column, exact: Column): Column =
      abs(nat - exact) <= lit(1e-9) * (abs(exact) + lit(1.0))
    g.select(col("l_returnflag"), col("n"), sk.as("skew"), ku.as("kurt"),
        ok(col("sk_nat"), sk).as("sk_ok"), ok(col("ku_nat"), ku).as("ku_ok"))
      .orderBy(col("l_returnflag"))
  }

  private val qSkewKurtSql =
    """WITH g AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(l_quantity*l_quantity AS BIGINT)) AS DOUBLE) AS s2,
      |    CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS BIGINT)) AS DOUBLE) AS s3,
      |    CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity AS BIGINT)) AS DOUBLE) AS s4
      |  FROM lineitem GROUP BY l_returnflag),
      |m AS (
      |  SELECT l_returnflag, n,
      |    CAST(n AS DOUBLE) AS nd, s1 / CAST(n AS DOUBLE) AS mean,
      |    s2 - s1 * s1 / CAST(n AS DOUBLE) AS m2, s1, s2, s3, s4
      |  FROM g)
      |SELECT l_returnflag, n,
      |  SQRT(nd) * (s3 - 3.0 * mean * s2 + 2.0 * nd * mean * mean * mean)
      |    / (m2 * SQRT(m2)) AS skew,
      |  nd * (s4 - 4.0 * mean * s3 + 6.0 * mean * mean * s2
      |        - 3.0 * nd * mean * mean * mean * mean) / (m2 * m2) - 3.0
      |    AS kurt,
      |  TRUE AS sk_ok, TRUE AS ku_ok
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** TRY_CAST semantics: malformed input → NULL, not error, on both
    * engines (string→BIGINT and string→DATE incl. an impossible calendar
    * date). */
  private def qTryCast(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val k = col("n_nationkey")
    t.nation.select(k,
        when(k % 4 === 0, lit("42")).when(k % 4 === 1, lit("abc"))
          .when(k % 4 === 2, lit("")).otherwise(lit("-7")).as("s"),
        when(k % 2 === 0, lit("2024-02-29")).otherwise(lit("2024-02-30"))
          .as("d"))
      // date → string for the compare: pandas renders date32 and
      // timestamp differently, so a raw DATE column false-mismatches
      .select(k, expr("try_cast(s AS BIGINT)").as("i"),
        expr("try_cast(d AS DATE)").cast("string").as("dt"))
      .orderBy(k)
  }

  private val qTryCastSql =
    """SELECT n_nationkey,
      |  TRY_CAST(CASE WHEN n_nationkey % 4 = 0 THEN '42'
      |                WHEN n_nationkey % 4 = 1 THEN 'abc'
      |                WHEN n_nationkey % 4 = 2 THEN ''
      |                ELSE '-7' END AS BIGINT) AS i,
      |  CAST(TRY_CAST(CASE WHEN n_nationkey % 2 = 0 THEN '2024-02-29'
      |                ELSE '2024-02-30' END AS DATE) AS VARCHAR) AS dt
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Edit distance (same Wagner–Fischer definition in both engines),
    * folded into a distance histogram. */
  private def qLevenshtein(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.supplier
      .select(levenshtein(col("s_name"), lit("Supplier#000000000"))
        .cast("long").as("dist"))
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("dist"))
  }

  private val qLevenshteinSql =
    """SELECT CAST(levenshtein(s_name, 'Supplier#000000000') AS BIGINT)
      |    AS dist, COUNT(*) AS n
      |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin

  /** UNION ALL BY NAME (DuckDB extension): columns align by NAME, not
    * position; a column missing from one side becomes NULL. Spark-native:
    * unionByName(allowMissingColumns = true). */
  private def qUnionByName(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val a = t.orders.filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lit(1L).as("src"))
    val b = t.orders.filter(col("o_orderkey") % 991 === 0)
      .select(col("o_custkey"), col("o_orderkey"), lit(2L).as("src"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy(col("src"), col("o_orderkey"))
  }

  private val qUnionByNameSql =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice, CAST(1 AS BIGINT) AS src
      |  FROM orders WHERE o_orderkey % 997 = 0
      |  UNION ALL BY NAME
      |  SELECT o_custkey, o_orderkey, CAST(2 AS BIGINT) AS src
      |  FROM orders WHERE o_orderkey % 991 = 0)
      |ORDER BY src, o_orderkey""".stripMargin

  /** Shannon entropy (DuckDB `entropy(x)`, log-2). Spark has no entropy
    * aggregate; H = log2(T) − Σ c·log2(c)/T over the per-key counts is
    * the same statistic. log2 is NOT correctly rounded across libms (same
    * caveat as pow), so H itself can never be hash-exact cross-engine —
    * instead the hash compares the EXACT sufficient statistic (the sorted
    * per-type count multiset as a string, plus n), and DuckDB's native
    * ENTROPY is asserted against the formula within 1e-9 relative as a
    * boolean on ITS side; Spark's boolean pins H into the information-
    * theoretic bound [0, log2(k)] of the same exact counts. */
  private def qEntropy(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val counts = t.events
      .groupBy((col("user_id") % 50).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("bucket"))
      .agg(sum(col("c")).as("tot"),
        sum(col("c").cast("double") * log(2.0, col("c"))).as("clog"),
        count(lit(1)).as("k"),
        array_join(sort_array(collect_list(col("c"))), ",").as("counts"))
      .select(col("bucket"), col("counts"), col("tot").as("n"), col("k"),
        (log(2.0, col("tot")) - col("clog") / col("tot").cast("double"))
          .as("h"))
      .select(col("bucket"), col("counts"), col("n"),
        (col("h") >= lit(-1e-9) &&
          col("h") <= log(2.0, col("k").cast("double")) + lit(1e-9))
          .as("h_ok"))
      .orderBy(col("bucket"))
  }

  private val qEntropySql =
    """WITH c AS (
      |  SELECT user_id % 50 AS bucket, event_type, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT bucket, STRING_AGG(CAST(c AS VARCHAR), ',' ORDER BY c) AS counts,
      |    SUM(c) AS n,
      |    LOG2(CAST(SUM(c) AS DOUBLE))
      |      - SUM(CAST(c AS DOUBLE) * LOG2(CAST(c AS DOUBLE)))
      |        / CAST(SUM(c) AS DOUBLE) AS h_formula
      |  FROM c GROUP BY bucket),
      |e AS (
      |  SELECT user_id % 50 AS bucket, ENTROPY(event_type) AS h_nat
      |  FROM events GROUP BY 1)
      |SELECT s.bucket, s.counts, CAST(s.n AS BIGINT) AS n,
      |  ABS(e.h_nat - s.h_formula) <= 1e-9 * (ABS(s.h_formula) + 1.0) AS h_ok
      |FROM s JOIN e ON s.bucket = e.bucket ORDER BY s.bucket""".stripMargin

  /** Discrete percentile: smallest value whose cumulative distribution
    * reaches the fraction (DuckDB quantile_disc; SQL-standard
    * percentile_disc WITHIN GROUP in Spark). Exact — no interpolation.
    * Convention pin: both sides return the element at sorted index
    * ceil(p*n) (1-based), i.e. the smallest value with cume_dist >= p.
    * DuckDB 1.0.0's QUANTILE_DISC matches; if a future oracle-engine bump
    * changes quantile_disc's index convention, THIS row is the canary. */
  private def qPercentileDisc(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(expr(
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  private val qPercentileDiscSql =
    """SELECT o_orderpriority,
      |  QUANTILE_DISC(o_totalprice, 0.25) AS p25,
      |  QUANTILE_DISC(o_totalprice, 0.5) AS p50,
      |  QUANTILE_DISC(o_totalprice, 0.9) AS p90,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** MAP column THROUGH the lake (reference test/sql/types/map.test):
    * map<string,string> and map<string,bigint> survive the parquet
    * encoding + catalog type string + footer-stats path; values extracted
    * back out by key must match the source scalars the DuckDB oracle
    * recomputes directly. */
  private def qLakeMapType(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.nation.select(col("n_nationkey"),
      map(lit("name"), col("n_name"),
        lit("upper"), upper(col("n_name"))).as("m"),
      map(concat(lit("k"), col("n_nationkey").cast("string")),
        col("n_regionkey").cast("long")).as("m2"))
    val lake = freshLake(spark)
    lake.createTableAs("tm", src)
    detached(lake, lake.table("tm")
      .select(col("n_nationkey"),
        element_at(col("m"), "name").as("v_name"),
        element_at(col("m"), "upper").as("v_upper"),
        element_at(col("m2"),
          concat(lit("k"), col("n_nationkey").cast("string"))).as("v_reg"),
        size(col("m")).cast("long").as("m_len"))
      .orderBy(col("n_nationkey")))
  }

  private val qLakeMapTypeSql =
    """SELECT n_nationkey, n_name AS v_name, UPPER(n_name) AS v_upper,
      |  CAST(n_regionkey AS BIGINT) AS v_reg, CAST(2 AS BIGINT) AS m_len
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** BLOB column through the lake: md5 bytes stored as parquet binary,
    * read back and re-hexed; byte length preserved. */
  private def qLakeBlob(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.nation.select(col("n_nationkey"),
      unhex(md5(col("n_name").cast("binary"))).as("b"))
    val lake = freshLake(spark)
    lake.createTableAs("tb", src)
    detached(lake, lake.table("tb")
      .select(col("n_nationkey"), lower(hex(col("b"))).as("h"),
        length(col("b")).cast("long").as("blen"))
      .orderBy(col("n_nationkey")))
  }

  private val qLakeBlobSql =
    """SELECT n_nationkey, md5(n_name) AS h, CAST(16 AS BIGINT) AS blen
      |FROM nation ORDER BY n_nationkey""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q_stats_agg", qStatsAgg, Some(qStatsAggSql)),
    QueryDef("q_skew_kurt", qSkewKurt, Some(qSkewKurtSql)),
    QueryDef("q_try_cast", qTryCast, Some(qTryCastSql)),
    QueryDef("q_levenshtein", qLevenshtein, Some(qLevenshteinSql)),
    QueryDef("q_union_by_name", qUnionByName, Some(qUnionByNameSql)),
    QueryDef("q_entropy", qEntropy, Some(qEntropySql)),
    QueryDef("q_percentile_disc", qPercentileDisc, Some(qPercentileDiscSql)),
    QueryDef("lake_map_type", qLakeMapType, Some(qLakeMapTypeSql)),
    QueryDef("lake_blob_roundtrip", qLakeBlob, Some(qLakeBlobSql)),
  )
}
