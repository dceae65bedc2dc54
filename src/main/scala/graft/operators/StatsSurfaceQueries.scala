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

  /** Variance family + correlation (DuckDB stddev_samp/var_pop/corr):
    * rounded to 4 dp — summation-order noise is ~1e-10 relative, four
    * decimals is ~6 orders of magnitude of headroom. */
  private def qStatsAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_pop(col("l_quantity")), 4).as("vp_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("corr_qp"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val qStatsAggSql =
    """SELECT l_returnflag,
      |  ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
      |  ROUND(VAR_POP(l_quantity), 4) AS vp_qty,
      |  ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qp,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

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
    * the exact same statistic from one extra (tiny) aggregation. */
  private def qEntropy(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val counts = t.events
      .groupBy((col("user_id") % 50).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("bucket"))
      .agg(sum(col("c")).as("tot"),
        sum(col("c").cast("double") * log(2.0, col("c"))).as("clog"))
      .select(col("bucket"),
        round(log(2.0, col("tot")) - col("clog") / col("tot").cast("double"),
          6).as("h"),
        col("tot").as("n"))
      .orderBy(col("bucket"))
  }

  private val qEntropySql =
    """SELECT user_id % 50 AS bucket, ROUND(ENTROPY(event_type), 6) AS h,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Discrete percentile: smallest value whose cumulative distribution
    * reaches the fraction (DuckDB quantile_disc; SQL-standard
    * percentile_disc WITHIN GROUP in Spark). Exact — no interpolation. */
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
