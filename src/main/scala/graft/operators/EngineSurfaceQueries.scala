package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import graft.QueryDsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-surface breadth: LATERAL, GROUPING(), ordered string_agg,
  * exact median, regexp extraction, date arithmetic, RANGE window frames
  * and VALUES joins — sqllogictest-category shapes the reference re-runs
  * against a DuckLake attach (test/configs/attach_ducklake.json). Each
  * query picks the Spark-native formulation of the same semantics (e.g.
  * LATERAL top-n → ranked window; ordered string_agg →
  * sort_array∘collect_list) so the plan is the one a Spark engine should
  * produce, not a literal SQL transliteration. */
object EngineSurfaceQueries extends QueryPack {

  /** LATERAL correlated top-n (DuckDB `, LATERAL (… ORDER BY … LIMIT 2)`):
    * per early customer their 2 priciest orders. Spark-native
    * decorrelation: rank window over the semi-filtered orders — one
    * shuffle on the join key, no per-row re-scan. */
  private def qLateralTopn(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders.filter(col("o_custkey") <= 100)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_totalprice").desc,
        col("o_orderkey"))
  }

  private val qLateralTopnSql =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_custkey <= 100
      |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin

  /** ROLLUP with GROUPING() markers — distinguishes a subtotal row's
    * NULL from a NULL in the data. */
  private def qGroupingId(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"),
        col("g_status"), col("n"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"),
        col("l_linestatus"))
  }

  private val qGroupingIdSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin

  /** Ordered string aggregation (DuckDB `string_agg(x, ',' ORDER BY x)`).
    * Spark has no ordered string_agg; `sort_array(collect_list(…))` +
    * `array_join` is the exact equivalent and keeps the partial-agg
    * path. */
  private def qStringAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.supplier
      .groupBy(col("s_nationkey"))
      .agg(array_join(sort_array(collect_list(col("s_name"))), ",")
        .as("names"))
      .orderBy(col("s_nationkey"))
  }

  private val qStringAggSql =
    """SELECT s_nationkey, STRING_AGG(s_name, ',' ORDER BY s_name) AS names
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Exact median (DuckDB `median`, Spark `percentile(…, 0.5)`): both
    * interpolate the middle pair; on integer-valued quantities the
    * arithmetic is exact so the doubles agree bitwise. */
  private def qMedian(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val qMedianSql =
    """SELECT l_returnflag, median(l_quantity) AS med_qty, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Regex extraction over the JSON props (first digit run), bucketed. */
  private def qRegexp(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("d", regexp_extract(col("props"), "[0-9]+", 0))
      .filter(col("d") =!= "")
      .groupBy(col("d").cast("long").as("first_num"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("first_num"))
      .limit(20)
  }

  private val qRegexpSql =
    """SELECT CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS first_num,
      |  COUNT(*) AS n
      |FROM events WHERE regexp_extract(props, '[0-9]+') <> ''
      |GROUP BY 1 ORDER BY n DESC, first_num LIMIT 20""".stripMargin

  /** Date arithmetic battery: day-difference buckets to a fixed horizon
    * (restricted to one sign so floor-vs-truncate division agrees). */
  private def qDateArith(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .withColumn("age_d",
        datediff(lit("1997-01-01").cast("date"), col("o_orderdate").cast("date")))
      .groupBy((col("age_d").cast("long") / 30).cast("long").as("age_months"))
      .agg(count(lit(1)).as("n"), max(col("age_d")).cast("long").as("max_d"))
      .orderBy(col("age_months"))
  }

  private val qDateArithSql =
    """SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1997-01-01') // 30 AS BIGINT) AS age_months,
      |  COUNT(*) AS n,
      |  CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '1997-01-01')) AS BIGINT) AS max_d
      |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY age_months""".stripMargin

  /** RANGE window frame (peers aggregate together — distinguishes RANGE
    * from ROWS on tied order keys): running order value per customer by
    * order DATE, ties summed as one peer group. Exact via scaled longs. */
  private def qWindowRangeFrame(spark: SparkSession, dir: String)
      : DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    t.orders.filter(col("o_custkey") <= 200)
      .withColumn("run_cents", sum(sl2(col("o_totalprice"))).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        col("run_cents"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val qWindowRangeFrameSql = {
    val s = oSl2("o_totalprice")
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(SUM($s) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
       |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS run_cents
       |FROM orders WHERE o_custkey <= 200
       |ORDER BY o_custkey, o_orderkey""".stripMargin
  }

  /** VALUES inline table joined to data (constant dim tables are common
    * in pipeline configs; broadcast by construction). */
  private def qValuesJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val spark2 = spark; import spark2.implicits._
    val dim = Seq(("O", "open"), ("F", "filled"), ("P", "pending"))
      .toDF("code", "status_name")
    t.orders
      .join(broadcast(dim), col("o_orderstatus") === col("code"))
      .groupBy(col("status_name"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status_name"))
  }

  private val qValuesJoinSql =
    """SELECT status_name, COUNT(*) AS n
      |FROM orders JOIN (VALUES ('O', 'open'), ('F', 'filled'),
      |  ('P', 'pending')) AS dim(code, status_name)
      |  ON o_orderstatus = code
      |GROUP BY status_name ORDER BY status_name""".stripMargin

  /** Window navigation battery — lead/lag with defaults, first/last
    * value over an explicit frame, ntile — one pass, one partition sort. */
  private def qWindowNav(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    t.orders.filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1, -1L).over(w).as("prev_ok"),
        lead(col("o_orderkey"), 1, -1L).over(w).as("next_ok"),
        first(col("o_orderkey")).over(wf).as("first_ok"),
        last(col("o_orderkey")).over(wf).as("last_ok"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val qWindowNavSql =
    """SELECT o_custkey, o_orderkey,
      |  LAG(o_orderkey, 1, -1) OVER w AS prev_ok,
      |  LEAD(o_orderkey, 1, -1) OVER w AS next_ok,
      |  FIRST_VALUE(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND UNBOUNDED FOLLOWING) AS first_ok,
      |  LAST_VALUE(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND UNBOUNDED FOLLOWING) AS last_ok,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Bitwise aggregates over integer keys — order-independent, exact. */
  private def qBitAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(bit_and(col("l_partkey")).as("pk_and"),
        bit_or(col("l_partkey")).as("pk_or"),
        bit_xor(col("l_partkey")).as("pk_xor"))
      .orderBy(col("l_returnflag"))
  }

  private val qBitAggSql =
    """SELECT l_returnflag, BIT_AND(l_partkey) AS pk_and,
      |  BIT_OR(l_partkey) AS pk_or, BIT_XOR(l_partkey) AS pk_xor
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Boolean aggregates + count_if (predicate push into aggregation). */
  private def qBoolAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(col("o_orderstatus"))
      .agg(bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000.0).as("any_over_400k"),
        count_if(col("o_orderpriority") === "1-URGENT").as("n_urgent"))
      .orderBy(col("o_orderstatus"))
  }

  private val qBoolAggSql =
    """SELECT o_orderstatus,
      |  BOOL_AND(o_totalprice > 1000.0) AS all_over_1k,
      |  BOOL_OR(o_totalprice > 400000.0) AS any_over_400k,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** FILTER-clause conditional aggregation (SQL:2003; DuckDB supports it
    * natively, Spark's codegen'd equivalent is count-of-CASE — identical
    * semantics, no extra pass over the data). */
  private def qFilterAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(count(when(col("l_quantity") > 25, 1)).as("n_big"),
        count(when(col("l_discount") === 0.0, 1)).as("n_nodisc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val qFilterAggSql =
    """SELECT l_returnflag,
      |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
      |  COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** arg_max/arg_min (DuckDB) = max_by/min_by (Spark): the ordering key
    * is a fixed-width `price|orderkey` string, so lexicographic order
    * equals (price, orderkey) numeric order and ties are impossible —
    * both engines' arg functions are tie-nondeterministic otherwise. */
  private def qArgMax(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val key = format_string("%018.2f|%010d",
      col("o_totalprice"), col("o_orderkey"))
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(max_by(col("o_orderkey"), key).as("best_order"),
        min_by(col("o_orderkey"), key).as("worst_order"),
        max(col("o_totalprice")).as("best_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val qArgMaxSql =
    """SELECT o_orderpriority,
      |  arg_max(o_orderkey, printf('%018.2f|%010d', o_totalprice, o_orderkey)) AS best_order,
      |  arg_min(o_orderkey, printf('%018.2f|%010d', o_totalprice, o_orderkey)) AS worst_order,
      |  MAX(o_totalprice) AS best_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** array function family over split strings: sort, distinct, contains
    * (DuckDB list_* = Spark array_*). Output flattened to scalars so the
    * compare is representation-independent. */
  private def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val words = split(col("p_name"), " ")
    t.part.filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        array_join(array_sort(words), "|").as("sorted_words"),
        size(array_distinct(words)).cast("long").as("n_uniq"),
        array_contains(words, "green").as("has_green"))
      .orderBy(col("p_partkey"))
  }

  private val qArrayFuncsSql =
    """SELECT p_partkey,
      |  array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words,
      |  CAST(len(list_distinct(string_split(p_name, ' '))) AS BIGINT) AS n_uniq,
      |  list_contains(string_split(p_name, ' '), 'green') AS has_green
      |FROM part WHERE p_partkey <= 200 ORDER BY 1""".stripMargin

  /** greatest/least variadic comparisons with NULL-skipping semantics
    * (both engines return the extreme NON-NULL argument). */
  private def qGreatestLeast(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.filter(col("o_orderkey") <= 1000)
      .select(col("o_orderkey"),
        greatest(col("o_totalprice"), lit(100000.0)).as("g"),
        least(col("o_orderkey").cast("double"), col("o_totalprice"),
          lit(50000.0)).as("l"),
        greatest(col("o_totalprice"),
          lit(null).cast("double")).as("gn"))
      .orderBy(col("o_orderkey"))
  }

  private val qGreatestLeastSql =
    """SELECT o_orderkey, greatest(o_totalprice, 100000.0) AS g,
      |  least(CAST(o_orderkey AS DOUBLE), o_totalprice, 50000.0) AS l,
      |  greatest(o_totalprice, CAST(NULL AS DOUBLE)) AS gn
      |FROM orders WHERE o_orderkey <= 1000 ORDER BY 1""".stripMargin

  /** Higher-order lambda functions over arrays (DuckDB list_transform /
    * list_filter / list_reduce ↔ Spark transform / filter / aggregate) —
    * all three stay inside whole-stage codegen, no UDFs. list_reduce has
    * no init value (seeds with the first element); Spark's aggregate
    * seeds with lit(0), identical for non-empty word lists (+). */
  private def qLambdaFuncs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val words = split(col("p_name"), " ")
    t.part.filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        array_join(transform(words, w => upper(w)), "|").as("up_words"),
        array_join(filter(words, w => length(w) > 4), "|")
          .as("long_words"),
        aggregate(transform(words, w => length(w)), lit(0),
          (a, b) => a + b).cast("long").as("tot_len"))
      .orderBy(col("p_partkey"))
  }

  private val qLambdaFuncsSql =
    """SELECT p_partkey,
      |  array_to_string(list_transform(string_split(p_name, ' '),
      |    w -> upper(w)), '|') AS up_words,
      |  COALESCE(array_to_string(list_filter(string_split(p_name, ' '),
      |    w -> len(w) > 4), '|'), '') AS long_words,
      |  CAST(list_reduce(list_transform(string_split(p_name, ' '),
      |    w -> len(w)), (a, b) -> a + b) AS BIGINT) AS tot_len
      |FROM part WHERE p_partkey <= 200 ORDER BY 1""".stripMargin

  /** printf-style formatting + pad/translate/split_part/repeat/left/
    * right/strpos — the string-function breadth beyond q_string_funcs. */
  private def qStringFuncs2(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.supplier.filter(col("s_suppkey") <= 100)
      .select(col("s_suppkey"),
        format_string("%s-%03d", col("s_name"), col("s_nationkey"))
          .as("tagged"),
        lpad(col("s_nationkey").cast("string"), 4, "0").as("padded"),
        translate(col("s_name"), "#0", "_x").as("xlated"),
        expr("split_part(s_name, '#', 2)").as("num_part"),
        repeat(expr("left(s_name, 2)"), 2).as("rep2"),
        expr("right(s_name, 3)").as("last3"),
        instr(col("s_name"), "#").cast("long").as("pos_hash"))
      .orderBy(col("s_suppkey"))
  }

  private val qStringFuncs2Sql =
    """SELECT s_suppkey,
      |  printf('%s-%03d', s_name, s_nationkey) AS tagged,
      |  lpad(CAST(s_nationkey AS VARCHAR), 4, '0') AS padded,
      |  translate(s_name, '#0', '_x') AS xlated,
      |  split_part(s_name, '#', 2) AS num_part,
      |  repeat(left(s_name, 2), 2) AS rep2,
      |  right(s_name, 3) AS last3,
      |  CAST(strpos(s_name, '#') AS BIGINT) AS pos_hash
      |FROM supplier WHERE s_suppkey <= 100 ORDER BY s_suppkey""".stripMargin

  /** Frame EXCLUDE CURRENT ROW (DuckDB window extension; Spark has no
    * EXCLUDE clause — whole-partition sum minus the current row's value,
    * in scaled-long cents so the subtraction is exact). One semantic
    * wrinkle: a single-row partition gives DuckDB an EMPTY frame, whose
    * SUM is NULL — not 0 — so the subtraction is guarded by the
    * partition count. */
  private def qWindowExclude(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders.filter(col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"),
        when(count(lit(1)).over(w) > 1,
          sum(sl2(col("o_totalprice"))).over(w) - sl2(col("o_totalprice")))
          .as("others_cents"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val qWindowExcludeSql =
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(SUM(${oSl2("o_totalprice")}) OVER (
       |    PARTITION BY o_custkey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       |    EXCLUDE CURRENT ROW) AS BIGINT) AS others_cents
       |FROM orders WHERE o_custkey <= 200
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** lead/lag with IGNORE NULLS: the previous PURCHASE event id carried
    * across intervening non-purchase rows. */
  private def qLagIgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    t.events.filter(col("user_id") <= 20)
      .select(col("user_id"), col("event_id"),
        lag(when(col("event_type") === "purchase", col("event_id")),
          1, null, ignoreNulls = true).over(w).as("prev_purchase"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val qLagIgnoreNullsSql =
    """SELECT user_id, event_id,
      |  lag(CASE WHEN event_type = 'purchase' THEN event_id END
      |      IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY event_id) AS prev_purchase
      |FROM events WHERE user_id <= 20 ORDER BY user_id, event_id""".stripMargin

  /** Multi-column COUNT(DISTINCT a, b) — distinct pairs, not a distinct
    * concatenation (both columns are NOT NULL here, where the two
    * engines' null-tuple conventions agree). */
  private def qCountDistinctMulti(spark: SparkSession, dir: String)
      : DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("uniq_ps"),
        countDistinct(col("l_suppkey")).as("uniq_s"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val qCountDistinctMultiSql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS uniq_ps,
      |  COUNT(DISTINCT l_suppkey) AS uniq_s, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Global regexp_replace with a capture-group backreference. Spark
    * replaces ALL matches and spells backrefs `$1`; DuckDB needs the
    * explicit 'g' option and spells them `\1` — same semantics. */
  private def qRegexpReplace(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.supplier.filter(col("s_suppkey") <= 100)
      .select(col("s_suppkey"),
        regexp_replace(col("s_name"), "0+([1-9][0-9]*)$", "$1")
          .as("trimmed"),
        regexp_replace(col("s_name"), "[0-9]", "#").as("masked"))
      .orderBy(col("s_suppkey"))
  }

  private val qRegexpReplaceSql =
    """SELECT s_suppkey,
      |  regexp_replace(s_name, '0+([1-9][0-9]*)$', '\1', 'g') AS trimmed,
      |  regexp_replace(s_name, '[0-9]', '#', 'g') AS masked
      |FROM supplier WHERE s_suppkey <= 100 ORDER BY s_suppkey""".stripMargin

  /** Struct construction + field extraction (DuckDB struct literal /
    * struct_extract ↔ Spark struct/getField), flattened back to scalars
    * for the compare. */
  private def qStructFuncs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val s = struct(col("n_name").as("name"), col("n_regionkey").as("region"))
    t.nation
      .select(col("n_nationkey"), s.getField("name").as("sname"),
        s.getField("region").cast("long").as("sregion"))
      .orderBy(col("n_nationkey"))
  }

  private val qStructFuncsSql =
    """SELECT n_nationkey,
      |  struct_extract({'name': n_name, 'region': n_regionkey}, 'name')
      |    AS sname,
      |  CAST(struct_extract({'name': n_name, 'region': n_regionkey},
      |    'region') AS BIGINT) AS sregion
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** QUALIFY (DuckDB post-window filter clause): top-2 suppliers per
    * nation by balance. Spark-native: the same window + a plain filter —
    * QUALIFY is sugar over exactly this plan. */
  private def qQualify(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    t.supplier
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        col("rn"))
      .orderBy(col("s_nationkey"), col("rn"))
  }

  private val qQualifySql =
    """SELECT s_nationkey, s_suppkey, s_acctbal,
      |  CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT s_nationkey, s_suppkey, s_acctbal,
      |    row_number() OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal DESC, s_suppkey) AS rn
      |  FROM supplier QUALIFY rn <= 2)
      |ORDER BY s_nationkey, rn""".stripMargin

  /** DISTINCT ON (DuckDB/Postgres): first row per key under the query's
    * ORDER BY. Spark-native: rank-1 window over the same total order. */
  private def qDistinctOn(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    t.supplier
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("s_nationkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_nationkey"))
  }

  private val qDistinctOnSql =
    """SELECT DISTINCT ON (s_nationkey) s_nationkey, s_name, s_acctbal
      |FROM supplier
      |ORDER BY s_nationkey, s_acctbal DESC, s_suppkey""".stripMargin

  /** LIMIT/OFFSET pagination under a unique total order — deterministic
    * page on both engines. */
  private def qOffsetLimit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.orderBy(col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"))
      .offset(100).limit(25)
  }

  private val qOffsetLimitSql =
    """SELECT o_orderkey, o_custkey FROM orders
      |ORDER BY o_orderkey LIMIT 25 OFFSET 100""".stripMargin

  /** time_bucket (DuckDB interval bucketing ↔ Spark's tumbling window):
    * both align sub-day buckets to the unix epoch, so the 15-minute
    * bucket starts agree exactly. */
  private def qTimeBucket(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .select(col("window.start").as("bucket"), col("n"), col("users"))
      .orderBy(col("bucket"))
      .limit(200)
  }

  private val qTimeBucketSql =
    """SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket,
      |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
      |FROM events GROUP BY 1 ORDER BY 1 LIMIT 200""".stripMargin

  /** NULLIF / COALESCE / IFNULL composition — the null-handling scalar
    * trio, nested the way real queries chain them. */
  private def qNullFuncs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("pri_or_null"),
        coalesce(nullif(col("o_orderpriority"), lit("3-MEDIUM")),
          lit("DEFAULT")).as("pri_def"),
        ifnull(nullif(col("o_custkey").cast("long"), lit(0L)), lit(-1L))
          .as("cust_or_neg"))
      .orderBy(col("o_orderkey"))
  }

  private val qNullFuncsSql =
    """SELECT o_orderkey,
      |  NULLIF(o_orderpriority, '3-MEDIUM') AS pri_or_null,
      |  COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'DEFAULT') AS pri_def,
      |  IFNULL(NULLIF(CAST(o_custkey AS BIGINT), 0), -1) AS cust_or_neg
      |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q_time_bucket", qTimeBucket, Some(qTimeBucketSql)),
    QueryDef("q_null_funcs", qNullFuncs, Some(qNullFuncsSql)),
    QueryDef("q_qualify", qQualify, Some(qQualifySql)),
    QueryDef("q_distinct_on", qDistinctOn, Some(qDistinctOnSql)),
    QueryDef("q_offset_limit", qOffsetLimit, Some(qOffsetLimitSql)),
    QueryDef("q_lag_ignore_nulls", qLagIgnoreNulls, Some(qLagIgnoreNullsSql)),
    QueryDef("q_count_distinct_multi", qCountDistinctMulti,
      Some(qCountDistinctMultiSql)),
    QueryDef("q_regexp_replace", qRegexpReplace, Some(qRegexpReplaceSql)),
    QueryDef("q_struct_funcs", qStructFuncs, Some(qStructFuncsSql)),
    QueryDef("q_lambda_funcs", qLambdaFuncs, Some(qLambdaFuncsSql)),
    QueryDef("q_string_funcs2", qStringFuncs2, Some(qStringFuncs2Sql)),
    QueryDef("q_window_exclude", qWindowExclude, Some(qWindowExcludeSql)),
    QueryDef("q_filter_agg", qFilterAgg, Some(qFilterAggSql)),
    QueryDef("q_arg_max", qArgMax, Some(qArgMaxSql)),
    QueryDef("q_array_funcs", qArrayFuncs, Some(qArrayFuncsSql)),
    QueryDef("q_greatest_least", qGreatestLeast, Some(qGreatestLeastSql)),
    QueryDef("q_window_nav", qWindowNav, Some(qWindowNavSql)),
    QueryDef("q_bit_agg", qBitAgg, Some(qBitAggSql)),
    QueryDef("q_bool_agg", qBoolAgg, Some(qBoolAggSql)),
    QueryDef("q_lateral_topn", qLateralTopn, Some(qLateralTopnSql)),
    QueryDef("q_grouping_id", qGroupingId, Some(qGroupingIdSql)),
    QueryDef("q_string_agg", qStringAgg, Some(qStringAggSql)),
    QueryDef("q_median_exact", qMedian, Some(qMedianSql)),
    QueryDef("q_regexp_extract", qRegexp, Some(qRegexpSql)),
    QueryDef("q_date_arith", qDateArith, Some(qDateArithSql)),
    QueryDef("q_window_range_frame", qWindowRangeFrame,
      Some(qWindowRangeFrameSql)),
    QueryDef("q_values_join", qValuesJoin, Some(qValuesJoinSql)),
  )
}
