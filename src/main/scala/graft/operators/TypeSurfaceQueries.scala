package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Type-surface lake roundtrips (reference test/sql/types/: all_types
  * .test, null_byte.test, decimals, nested types, interval arithmetic):
  * each query derives typed values deterministically from the nation
  * table, writes them THROUGH a throwaway lake (parquet encoding +
  * catalog type mapping + footer stats on the exotic type), reads them
  * back, and flattens to plain columns the DuckDB oracle recomputes
  * directly — so a hash match proves the lake preserved the type
  * bit-for-bit, not just that both engines can compute it.
  */
object TypeSurfaceQueries extends QueryPack {

  import LakeQueries.{detached, freshLake}

  /** DECIMAL(38,10) extremes: near-max positive and negative values with
    * a per-row component, stored and stat-tracked at full precision.
    * Operands are DECIMAL(37,10) so BOTH engines type the sum as exactly
    * DECIMAL(38,10) (Spark would otherwise shave the scale to fit). */
  private def qDecimal38(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.nation.select(col("n_nationkey"),
      (lit("12345678901234567890123456.1234567891").cast("decimal(37,10)") +
        col("n_nationkey").cast("decimal(37,10)")).as("d_hi"),
      (lit("-99999999999999999999999999.9999999999").cast("decimal(37,10)") +
        col("n_nationkey").cast("decimal(37,10)")).as("d_lo"))
    val lake = freshLake(spark)
    lake.createTableAs("td", src)
    // output as exact decimal TEXT: the compare harness reads both sides
    // into pandas, which silently floats a DECIMAL(38) beyond 2^53
    detached(lake, lake.table("td")
      .select(col("n_nationkey"),
        col("d_hi").cast("string").as("d_hi"),
        col("d_lo").cast("string").as("d_lo"))
      .orderBy(col("n_nationkey")))
  }

  private val qDecimal38Sql =
    """SELECT n_nationkey,
      |  CAST(CAST('12345678901234567890123456.1234567891' AS DECIMAL(37,10))
      |    + CAST(n_nationkey AS DECIMAL(37,10)) AS VARCHAR) AS d_hi,
      |  CAST(CAST('-99999999999999999999999999.9999999999' AS DECIMAL(37,10))
      |    + CAST(n_nationkey AS DECIMAL(37,10)) AS VARCHAR) AS d_lo
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** NUL bytes and non-BMP unicode inside VARCHAR: stored verbatim,
    * length/substr count code points on both engines (reference
    * null_byte.test). */
  private def qNullByte(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.nation.select(col("n_nationkey"),
      concat(col("n_name"), expr("chr(0)"), lit("x"), lit("é中😀"))
        .as("s"))
    val lake = freshLake(spark)
    lake.createTableAs("ts", src)
    detached(lake, lake.table("ts")
      .select(col("n_nationkey"), col("s"),
        length(col("s")).cast("long").as("len"),
        substring(col("s"), 2, 9).as("sub"))
      .orderBy(col("n_nationkey")))
  }

  private val qNullByteSql =
    """SELECT n_nationkey, n_name || chr(0) || 'x' || 'é中😀' AS s,
      |  CAST(length(n_name || chr(0) || 'x' || 'é中😀') AS BIGINT) AS len,
      |  substr(n_name || chr(0) || 'x' || 'é中😀', 2, 9) AS sub
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** struct-of-array-of-struct through the lake (nested catalog type
    * tree, reference nested types + column-mapping machinery); output is
    * flattened so the oracle compares plain values. Spark indexes arrays
    * from 0, DuckDB lists from 1 — each side spells its own. */
  private def qNestedStructArray(spark: SparkSession,
      dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.nation.select(col("n_nationkey"),
      struct(array(
        struct(col("n_nationkey").as("a"), col("n_name").as("b")),
        struct(col("n_regionkey").as("a"), lit("r").as("b"))).as("arr"))
        .as("s"))
    val lake = freshLake(spark)
    lake.createTableAs("tn", src)
    detached(lake, lake.table("tn")
      .select(col("n_nationkey"),
        col("s.arr")(0)("a").as("a1"),
        col("s.arr")(1)("b").as("b2"),
        size(col("s.arr")).cast("long").as("n"))
      .orderBy(col("n_nationkey")))
  }

  private val qNestedStructArraySql =
    """WITH t AS (SELECT n_nationkey,
      |  struct_pack(arr := [struct_pack(a := n_nationkey, b := n_name),
      |                      struct_pack(a := n_regionkey, b := 'r')]) AS s
      |  FROM nation)
      |SELECT n_nationkey, s.arr[1].a AS a1, s.arr[2].b AS b2,
      |  CAST(len(s.arr) AS BIGINT) AS n
      |FROM t ORDER BY n_nationkey""".stripMargin

  /** Interval arithmetic: month addition with end-of-month clamping
    * (Jan 31 + n months) and mixed day-time seconds, computed, stored,
    * and read back as timestamps. */
  private def qIntervalArith(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.nation.select(col("n_nationkey"),
      expr("timestampadd(MONTH, n_nationkey, " +
        "TIMESTAMP '2024-01-31 10:00:00')").as("m_ts"),
      (lit("2024-01-01 00:00:00").cast("timestamp") +
        expr("make_dt_interval(0, 0, 0, n_nationkey * 90061)")).as("s_ts"))
    val lake = freshLake(spark)
    lake.createTableAs("ti", src)
    detached(lake, lake.table("ti")
      .select(col("n_nationkey"),
        date_format(col("m_ts"), "yyyy-MM-dd HH:mm:ss").as("m"),
        date_format(col("s_ts"), "yyyy-MM-dd HH:mm:ss").as("s2"))
      .orderBy(col("n_nationkey")))
  }

  private val qIntervalArithSql =
    """SELECT n_nationkey,
      |  STRFTIME(TIMESTAMP '2024-01-31 10:00:00'
      |    + INTERVAL (n_nationkey) MONTH, '%Y-%m-%d %H:%M:%S') AS m,
      |  STRFTIME(TIMESTAMP '2024-01-01 00:00:00'
      |    + INTERVAL (n_nationkey * 90061) SECOND,
      |    '%Y-%m-%d %H:%M:%S') AS s2
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Nanosecond-epoch plumbing: an int64 nanos column stored through the
    * lake, truncated back to a micros timestamp on read (the same
    * nanos-as-long convention the events table's TIMESTAMP(NANOS)
    * ingestion uses, TESTDATA.md). */
  private def qTimestampNs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val baseUs = 1709294400000000L // 2024-03-01 12:00:00 UTC in micros
    val src = t.nation.select(col("n_nationkey"),
      (lit(baseUs) * 1000L + col("n_nationkey") * 1234567L +
        lit(789L)).as("ns"))
    val lake = freshLake(spark)
    lake.createTableAs("tt", src)
    detached(lake, lake.table("tt")
      .select(col("n_nationkey"), col("ns"),
        date_format(timestamp_micros(expr("ns DIV 1000")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("back"))
      .orderBy(col("n_nationkey")))
  }

  private val qTimestampNsSql =
    """SELECT n_nationkey,
      |  1709294400000000000 + n_nationkey * 1234567 + 789 AS ns,
      |  STRFTIME(make_timestamp((1709294400000000000
      |    + n_nationkey * 1234567 + 789) // 1000),
      |    '%Y-%m-%d %H:%M:%S.%f') AS back
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Small-int lattice + IEEE infinities through the lake: TINYINT /
    * SMALLINT survive parquet + catalog typing without silent widening,
    * and ±infinity doubles roundtrip (their footer stats must not poison
    * pruning — NaN/Inf are cannot-prove in the stats SQL). */
  private def qSmallInts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.nation.select(col("n_nationkey"),
      col("n_nationkey").cast("tinyint").as("ti"),
      (col("n_nationkey") * 100).cast("smallint").as("si"),
      lit(1e30).as("big"),
      when(col("n_nationkey") % 2 === 0, lit(Double.PositiveInfinity))
        .otherwise(lit(Double.NegativeInfinity)).as("inf"))
    val lake = freshLake(spark)
    lake.createTableAs("tsm", src)
    detached(lake, lake.table("tsm")
      .select(col("n_nationkey"), col("ti"), col("si"), col("big"),
        col("inf"))
      .filter(col("n_nationkey") < 100) // stats-pruned scan over inf stats
      .orderBy(col("n_nationkey")))
  }

  private val qSmallIntsSql =
    """SELECT n_nationkey, CAST(n_nationkey AS TINYINT) AS ti,
      |  CAST(n_nationkey * 100 AS SMALLINT) AS si,
      |  CAST(1e30 AS DOUBLE) AS big,
      |  CASE WHEN n_nationkey % 2 = 0 THEN CAST('infinity' AS DOUBLE)
      |       ELSE CAST('-infinity' AS DOUBLE) END AS inf
      |FROM nation WHERE n_nationkey < 100 ORDER BY n_nationkey""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("lake_decimal38", qDecimal38, Some(qDecimal38Sql)),
    QueryDef("lake_null_byte", qNullByte, Some(qNullByteSql)),
    QueryDef("lake_nested_struct_array", qNestedStructArray,
      Some(qNestedStructArraySql)),
    QueryDef("lake_interval_arith", qIntervalArith,
      Some(qIntervalArithSql)),
    QueryDef("lake_timestamp_ns", qTimestampNs, Some(qTimestampNsSql)),
    QueryDef("lake_small_ints", qSmallInts, Some(qSmallIntsSql)),
  )
}
