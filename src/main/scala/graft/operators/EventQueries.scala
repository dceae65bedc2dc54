package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import graft.QueryDsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickBench-style event analytics (the reference's second benchmark
  * corpus, test/sql/clickbench/clickbench.test_slow): high-cardinality
  * group-bys, top-k entities, time-series bucketing, and JSON property
  * extraction over the events table. */
object EventQueries extends QueryPack {

  /** hits-style: top users by activity + exact value volume. */
  private def topUsers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        lsum(sl2(col("value")), 100.0).as("total_value"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(20)
  }

  private val topUsersSql =
    s"""SELECT user_id, COUNT(*) AS n,
       |  ${oLsum(oSl2("value"), "100.0")} AS total_value
       |FROM events GROUP BY user_id
       |ORDER BY n DESC, user_id LIMIT 20""".stripMargin

  /** minute-grain time series for one event type on one day. */
  private def minuteSeries(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .filter(col("event_type") === "purchase" &&
        col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      // agg on the truncated timestamp; format only the output groups
      .groupBy(date_trunc("minute", col("ts")).as("minute_ts"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("minute_ts"), "yyyy-MM-dd HH:mm").as("minute"),
        col("n"))
      .orderBy(col("minute"))
  }

  private val minuteSeriesSql =
    """SELECT STRFTIME(DATE_TRUNC('minute', ts), '%Y-%m-%d %H:%M') AS minute,
      |  COUNT(*) AS n
      |FROM events
      |WHERE event_type = 'purchase'
      |  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-06 00:00:00'
      |GROUP BY 1 ORDER BY minute""".stripMargin

  /** JSON property extraction + bucketed aggregation (json scalar surface
    * — DuckLake's `json` alias type, SURVEY.md §1.3). */
  private def jsonBuckets(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy((col("k") / 10).cast("long").as("k_bucket"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy(col("k_bucket"))
  }

  private val jsonBucketsSql =
    """SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT) AS k_bucket,
      |  COUNT(*) AS n,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
      |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin

  /** sessionization-lite: per-user event-to-event gap stats.
    *
    * Formulated as ONE aggregation instead of a lag-window feeding an
    * aggregate: the window partition key (user_id) IS the final group
    * key, so `sort_array(collect_list(ts))` + an array gap pass computes
    * the same result with no WindowExec and no 100k-row partition sort —
    * the multiset of consecutive sorted-ts differences is invariant to
    * how ties are ordered, so this matches the reference's
    * `LAG OVER (ORDER BY ts, event_id)` semantics exactly. Plan: scan →
    * partial collect_list (map-side: rows become per-user array chunks,
    * shuffle rows drop from |events| to |users|×|tasks|) → one user_id
    * exchange → merge + per-user sort + gap fold. At 100 TB the per-user
    * arrays are session-bounded (same memory envelope the window's
    * per-partition sort buffer had), and the shuffle carries 8 B/event
    * payload with far fewer row headers than the row-per-event window
    * shuffle did. */
  private def gapStats(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // SKEW GUARD: aggregate per (user, 8-day bucket) FIRST, then merge
    // the per-bucket summaries per user. No single collect_list buffer
    // grows with a user's lifetime — only with one user-BUCKET — so a
    // hot key
    // (bot traffic: millions of events on one user) bounds memory by
    // bucket. Semantics are EXACTLY preserved: buckets partition time,
    // so concatenating the per-bucket sorted arrays in bucket order IS
    // the globally sorted array, and the gap multiset decomposes into
    // bucket-internal gaps plus one boundary gap per adjacent bucket
    // pair (prev bucket's max → next bucket's min). Two exchanges — one
    // on (user_id, bkt) carrying map-side partial arrays, one on user_id
    // carrying ~40 B bucket summaries — still ONE job (JobCountSpec);
    // the second shuffle's volume is |users|×|active days|, negligible
    // against the first. (A single user_id-only exchange was measured
    // too: it loses map-side partial aggregation and costs 2× at sf0.1.)
    val bucketUs = 8L * 86400L * 1000000L
    t.events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .groupBy(col("user_id"), expr(s"ts_us DIV ${bucketUs}L").as("bkt"))
      .agg(sort_array(collect_list(col("ts_us"))).as("tss"),
        count(lit(1)).as("cnt"))
      .select(col("user_id"), col("cnt"), struct(
        col("bkt"),
        element_at(col("tss"), 1).as("min_ts"),
        element_at(col("tss"), -1).as("max_ts"),
        expr("CASE WHEN size(tss) > 1 THEN aggregate(" +
          "transform(sequence(1, size(tss)-1)," +
          " i -> (tss[i] - tss[i-1]) DIV 1000000), 0L, (a, x) -> a + x)" +
          " ELSE 0L END").as("gsum"),
        expr("CASE WHEN size(tss) > 1 THEN array_max(" +
          "transform(sequence(1, size(tss)-1)," +
          " i -> (tss[i] - tss[i-1]) DIV 1000000))" +
          " ELSE CAST(NULL AS BIGINT) END").as("gmax")).as("b"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("b"))).as("bs"),
        sum(col("cnt")).as("n"))
      .filter(col("n") >= 6) // n_gaps = n-1 >= 5
      .withColumn("s", expr(
        """aggregate(bs,
          |  named_struct('pm', CAST(NULL AS BIGINT), 'tot', 0L,
          |               'mx', CAST(NULL AS BIGINT)),
          |  (a, b) -> named_struct(
          |    'pm', b.max_ts,
          |    'tot', a.tot + b.gsum +
          |           coalesce((b.min_ts - a.pm) DIV 1000000, 0L),
          |    'mx', greatest(a.mx, b.gmax,
          |                   (b.min_ts - a.pm) DIV 1000000)))""".stripMargin))
      .select(col("user_id"), (col("n") - 1).as("n_gaps"),
        col("s.tot").as("total_gap_s"), col("s.mx").as("max_gap_s"))
      // no final sort: row order is not part of the operator's semantics
      // (the oracle compare hashes sorted rows) and a per-user report at
      // corpus scale is consumed by key, not scanned in order
  }

  /** The same per-user gap stats as ONE exchange + a secondary-sort
    * streaming fold: repartition on user_id, sort each partition by
    * (user_id, ts), then a single mapPartitions pass holds O(1) state —
    * (prev_ts, count, total, max) — emitting a row at each user boundary.
    * No collect_list buffers AT ALL, so the hot-key bound is even tighter
    * than the 8-day-bucket guard (a 10^6-event bot user costs the
    * external sorter, which spills, not an aggregation buffer), and the
    * second micro-scale exchange the bucket plan pays disappears.
    * mapPartitions is the honest tool here: the fold is genuinely
    * per-partition imperative streaming over a clustered order — the one
    * shape the DataFrame API cannot express without either a window
    * (buffers whole user groups) or per-group arrays. Gap semantics
    * identical to the bucket plan: ties in ts yield 0-gaps regardless of
    * order, so sorting by ts alone matches the oracle's (ts, event_id)
    * window order. */
  private def gapStatsStream(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val n = spark.sessionState.conf.numShufflePartitions
    val base = t.events
      // the fold reads getLong without null checks — drop null keys/ts up
      // front (matches the SQL oracle: a NULL user_id forms no group in
      // the window's PARTITION BY arithmetic, and collect_list drops
      // nulls in the bucket formulation)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .repartition(n, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"))
    // fold directly over InternalRow (two getLong per input row, one
    // GenericInternalRow per emitted user) — no encoder round trip in
    // the hot loop (the Dataset[(Long, Long)] spelling deserializes a
    // boxed tuple per event)
    val out = base.queryExecution.toRdd.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
        import org.apache.spark.sql.catalyst.InternalRow
        import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
        private var hasPending = false
        private var pendUser = 0L
        private var pendTs = 0L
        locally {
          if (it.hasNext) {
            val r = it.next(); pendUser = r.getLong(0); pendTs = r.getLong(1)
            hasPending = true
          }
        }
        private var out0: InternalRow = _
        private var ready = false
        private def advance(): Unit = {
          while (hasPending && !ready) {
            val user = pendUser
            var prev = pendTs
            var cnt = 1L
            var tot = 0L
            var mx = Long.MinValue
            hasPending = false
            var done = false
            while (!done && it.hasNext) {
              val r = it.next()
              val u = r.getLong(0)
              val ts = r.getLong(1)
              if (u == user) {
                val g = (ts - prev) / 1000000L // sorted → diff ≥ 0
                tot += g
                if (g > mx) mx = g
                prev = ts
                cnt += 1
              } else {
                pendUser = u; pendTs = ts; hasPending = true
                done = true
              }
            }
            if (cnt >= 6) { // n_gaps = cnt-1 >= 5
              out0 = new GenericInternalRow(
                Array[Any](user, cnt - 1, tot, mx))
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
    org.apache.spark.sql.graftshim.ColumnBridge.ofInternalRows(spark, out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_gaps",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("total_gap_s",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("max_gap_s",
          org.apache.spark.sql.types.LongType))))
  }

  private val gapStatsSql =
    """WITH g AS (
      |  SELECT user_id,
      |    (epoch_us(ts) - epoch_us(LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) // 1000000 AS gap_s
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_gaps, CAST(SUM(gap_s) AS BIGINT) AS total_gap_s,
      |  MAX(gap_s) AS max_gap_s
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY user_id HAVING COUNT(*) >= 5
      |ORDER BY user_id""".stripMargin

  /** AS-OF join (DuckDB ASOF JOIN, which Spark lacks): each click matched
    * to the user's most recent prior-or-same-time purchase. */
  private def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"))
    AsofJoin.asof(clicks, purchases, "user_id", "ts", rightSuffix = "")
      .select(col("event_id"), col("purchase_id"))
      .orderBy(col("event_id"))
  }

  private val qAsofJoinSql =
    """WITH a AS (SELECT user_id, ts, event_id FROM events
      |           WHERE event_type = 'click'),
      |     b AS (SELECT user_id, ts, event_id AS purchase_id FROM events
      |           WHERE event_type = 'purchase')
      |SELECT a.event_id, b.purchase_id
      |FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
      |ORDER BY a.event_id""".stripMargin

  /** Band (range) join via bucketized equi-join instead of a nested loop:
    * customer/supplier balance pairs within ±10. */
  private def qBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    RangeJoin.bandJoin(
      t.customer.select(col("c_custkey"), col("c_acctbal")),
      t.supplier.select(col("s_suppkey"), col("s_acctbal")),
      "c_acctbal", "s_acctbal", band = 10.0)
      .select(col("c_custkey"), col("s_suppkey"))
      .orderBy(col("c_custkey"), col("s_suppkey"))
  }

  private val qBandJoinSql =
    """SELECT c_custkey, s_suppkey FROM customer, supplier
      |WHERE ABS(c_acctbal - s_acctbal) <= 10.0
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  /** Interpolated quantiles per group (ClickBench-style latency
    * percentiles); Spark `percentile` and DuckDB `quantile_cont` share the
    * p·(n−1) linear-interpolation definition. */
  private def qQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  private val qQuantilesSql =
    """SELECT event_type, QUANTILE_CONT(value, 0.5) AS p50,
      |  QUANTILE_CONT(value, 0.95) AS p95, COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** HLL-sketch distinct counts (rows-only: sketch implementations differ
    * across engines; the accuracy bound is asserted in SketchSpec). */
  /** HLL sketch with a verifiable output: the exact distinct count plus
    * a boolean asserting the HLL estimate (rsd 2%) landed within 10% of
    * it — so the engine-specific sketch value never reaches the compare,
    * but a broken sketch flips the boolean and fails the oracle. */
  private def qApproxUniq(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select(col("event_type"), col("users"),
        (abs(col("approx") - col("users")) <=
          col("users") * 0.1).as("within_10pct"))
      .orderBy(col("event_type"))
  }

  private val qApproxUniqSql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS users,
      |  TRUE AS within_10pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** ClickBench Q-series: per-type share of traffic with conditional
    * value sums (exact scaled-long arithmetic both engines). */
  private def typeShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        lsum(sl2(col("value")), 100.0).as("total_value"),
        sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("big"))
      .orderBy(col("n").desc, col("event_type"))
  }

  private val typeShareSql =
    s"""SELECT event_type, COUNT(*) AS n,
       |  ${oLsum(oSl2("value"), "100.0")} AS total_value,
       |  CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS big
       |FROM events GROUP BY event_type
       |ORDER BY n DESC, event_type""".stripMargin

  /** Exact distinct users per event type (ClickBench COUNT(DISTINCT
    * UserID) family — the exact twin of cb_approx_uniq). */
  private def uniqPerType(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  private val uniqPerTypeSql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Day-of-week × hour activity heatmap (two-dimensional EXTRACT
    * group-by, ClickBench time-dimension family). */
  private def dowHour(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("dow"), col("hr"))
  }

  private val dowHourSql =
    """SELECT EXTRACT(dow FROM ts) + 1 AS dow, EXTRACT(hour FROM ts) AS hr,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin

  /** Value histogram: fixed-width buckets (ClickBench numeric-dimension
    * family; floor-bucket on both engines). */
  private def valueHistogram(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(floor(col("value") / 10.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  private val valueHistogramSql =
    """SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket, COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin

  /** LIKE-filtered top-k (ClickBench URL LIKE '%google%' family) over the
    * raw JSON props string. */
  private def likeFilter(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .filter(col("props").like("%\"k\": 7%"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(25)
  }

  private val likeFilterSql =
    """SELECT user_id, COUNT(*) AS n FROM events
      |WHERE props LIKE '%"k": 7%'
      |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 25""".stripMargin

  /** Conversion funnel view → click → purchase: per user the FIRST view,
    * the first click strictly after it, the first purchase strictly
    * after that; counts per stage.
    *
    * ONE Spark job, one user_id exchange, one scan of events: per user
    * collect the (ts, stage) pairs (map-side partial collect_list), fold
    * the time-sorted list through the stage machine, then count users
    * per reached stage. Replaces the previous three driver `count()`
    * actions (which scanned events ~6× across 3 jobs) — at corpus scale
    * the funnel is a single wide stage plus two one-row reduces. Tie
    * semantics ("strictly after") are order-independent: the fold uses
    * strict `>` against the previous stage time, so equal-timestamp
    * events can never advance the funnel regardless of sort tie order. */
  private def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    // SKEW GUARD (same scheme as gapStats): fold per (user, day bucket)
    // first, merge bucket summaries per user second, so no collect_list
    // buffer grows with a user's lifetime. The per-bucket summary is the
    // funnel's TRANSITION FUNCTION restricted to this bucket: because
    // buckets partition time and are merged in order, any funnel time
    // entering a bucket is strictly earlier than every event inside it,
    // so the bucket's effect depends only on WHICH stages are already
    // reached — three cases, each computable bucket-locally:
    //   nothing reached → run the machine from scratch   (n_tv/n_tc/n_tp)
    //   view reached    → first click; first purchase after it (v_tc/v_tp)
    //   view+click      → first purchase                 (c_tp)
    // Tie semantics are unchanged: strict `>` applies within a bucket
    // (same expression as before) and across buckets strictness is
    // automatic (disjoint time ranges). Exchanges: (user_id, bkt) with
    // map-side partial arrays, then user_id with tiny bucket summaries —
    // still one job.
    val bucketUs = 8L * 86400L * 1000000L
    e.select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts"),
          when(col("event_type") === "view", 0)
            .when(col("event_type") === "click", 1)
            .when(col("event_type") === "purchase", 2).as("et")).as("ev"))
      .filter(col("ev.et").isNotNull)
      .groupBy(col("user_id"), expr(s"ev.ts DIV ${bucketUs}L").as("bkt"))
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      .withColumn("m", expr(
        """aggregate(evs,
          |  named_struct('tv', CAST(NULL AS BIGINT),
          |               'tc', CAST(NULL AS BIGINT),
          |               'tp', CAST(NULL AS BIGINT)),
          |  (a, x) -> named_struct(
          |    'tv', coalesce(a.tv, CASE WHEN x.et = 0 THEN x.ts END),
          |    'tc', coalesce(a.tc, CASE WHEN x.et = 1 AND x.ts > a.tv THEN x.ts END),
          |    'tp', coalesce(a.tp, CASE WHEN x.et = 2 AND x.ts > a.tc THEN x.ts END)))""".stripMargin))
      .withColumn("v_tc",
        expr("array_min(transform(filter(evs, x -> x.et = 1), x -> x.ts))"))
      .withColumn("v_tp", expr(
        "array_min(transform(filter(evs, x -> x.et = 2 AND x.ts > v_tc), x -> x.ts))"))
      .withColumn("c_tp",
        expr("array_min(transform(filter(evs, x -> x.et = 2), x -> x.ts))"))
      .select(col("user_id"), struct(col("bkt"),
        col("m.tv").as("n_tv"), col("m.tc").as("n_tc"),
        col("m.tp").as("n_tp"),
        col("v_tc"), col("v_tp"), col("c_tp")).as("b"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("b"))).as("bs"))
      .select(expr(
        """aggregate(bs,
          |  named_struct('tv', CAST(NULL AS BIGINT),
          |               'tc', CAST(NULL AS BIGINT),
          |               'tp', CAST(NULL AS BIGINT)),
          |  (a, b) -> named_struct(
          |    'tv', coalesce(a.tv, b.n_tv),
          |    'tc', coalesce(a.tc,
          |      CASE WHEN a.tv IS NULL THEN b.n_tc ELSE b.v_tc END),
          |    'tp', coalesce(a.tp,
          |      CASE WHEN a.tv IS NULL THEN b.n_tp
          |           WHEN a.tc IS NULL THEN b.v_tp
          |           ELSE b.c_tp END)))""".stripMargin)
        .as("s"))
      .agg(count(col("s.tv")).as("nv"), count(col("s.tc")).as("nc"),
        count(col("s.tp")).as("np"))
      .selectExpr("stack(3, '1_view', nv, '2_view_click', nc, " +
        "'3_full_funnel', np) AS (stage, n_users)")
      // the 3 stage rows sit in the global aggregate's single partition; a
      // global orderBy would add a RangePartitioning sample job for nothing
      .sortWithinPartitions(col("stage"))
  }

  private val qFunnelSql =
    """WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS tc FROM events e
      |      JOIN v ON e.user_id = v.user_id AND e.ts > v.tv
      |      WHERE e.event_type = 'click' GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS tp FROM events e
      |      JOIN c ON e.user_id = c.user_id AND e.ts > c.tc
      |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT stage, n_users FROM (
      |  SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      |  UNION ALL
      |  SELECT '2_view_click', CAST(COUNT(*) AS BIGINT) FROM c
      |  UNION ALL
      |  SELECT '3_full_funnel', CAST(COUNT(*) AS BIGINT) FROM p)
      |ORDER BY stage""".stripMargin

  /** Weekly retention cohorts: users grouped by first-activity week,
    * distinct actives counted k weeks later. Two hash aggregations plus
    * one shuffle on user_id — the cohort matrix every analytics engine
    * ships; week arithmetic kept as exact day-diff/7 on Monday-truncated
    * dates so both engines agree. */
  private def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val first = e.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("w0"))
    val active = e.select(col("user_id"),
      date_trunc("week", col("ts")).as("w")).distinct()
    first.join(active, "user_id")
      .withColumn("k",
        (datediff(col("w"), col("w0")) / 7).cast("int"))
      .groupBy(col("w0"), col("k"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("w0"), col("k"))
  }

  private val qRetentionSql =
    """WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS w0
      |           FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
      |SELECT f.w0, CAST(date_diff('day', f.w0, a.w) / 7 AS INT) AS k,
      |  CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users
      |FROM f JOIN a ON f.user_id = a.user_id
      |GROUP BY f.w0, k ORDER BY f.w0, k""".stripMargin

  /** PIVOT: event counts per user bucket, one column per event type —
    * Spark's relational pivot operator; the oracle spells it as
    * conditional aggregation so both engines emit identical columns. */
  private def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    e.withColumn("bucket", (col("user_id") % 10).cast("long"))
      .groupBy(col("bucket"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("bucket"))
  }

  private val qPivotSql =
    """SELECT user_id % 10 AS bucket,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q_pivot", qPivot, Some(qPivotSql)),
    QueryDef("cb_funnel", qFunnel, Some(qFunnelSql)),
    QueryDef("cb_retention", qRetention, Some(qRetentionSql)),
    QueryDef("cb_type_share", typeShare, Some(typeShareSql)),
    QueryDef("cb_uniq_per_type", uniqPerType, Some(uniqPerTypeSql)),
    QueryDef("cb_dow_hour", dowHour, Some(dowHourSql)),
    QueryDef("cb_value_histogram", valueHistogram, Some(valueHistogramSql)),
    QueryDef("cb_like_filter", likeFilter, Some(likeFilterSql)),
    QueryDef("cb_top_users", topUsers, Some(topUsersSql)),
    QueryDef("cb_minute_series", minuteSeries, Some(minuteSeriesSql)),
    QueryDef("cb_json_buckets", jsonBuckets, Some(jsonBucketsSql)),
    // default = the streaming fold (A/B r11: wins sf0.1 0.104/0.142 and
    // sf10 0.723/0.861, ties sf1 — and its O(1) per-user state is a
    // strictly tighter skew bound); the bucketed collect_list plan stays
    // as the named alternative (both hot-key-proven in HotKeySpec)
    QueryDef("cb_gap_stats", gapStatsStream, Some(gapStatsSql)),
    QueryDef("cb_gap_bucket", gapStats, Some(gapStatsSql)),
    QueryDef("q_asof_join", qAsofJoin, Some(qAsofJoinSql)),
    QueryDef("q_band_join", qBandJoin, Some(qBandJoinSql)),
    QueryDef("cb_quantiles", qQuantiles, Some(qQuantilesSql)),
    QueryDef("cb_approx_uniq", qApproxUniq, Some(qApproxUniqSql)),
  )
}
