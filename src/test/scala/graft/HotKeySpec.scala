package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew guard for the collect_list plans (cb_gap_stats / cb_funnel): one
  * synthetic HOT KEY — 10⁶ events on a single user, the bot-traffic shape
  * a corpus-scale events table always contains — must neither OOM a
  * per-key aggregation buffer nor change results. The guarded plans fold
  * per (user, day bucket) first and merge bucket summaries second, so
  * the biggest buffer is one user-DAY (10⁴ here), not one user lifetime
  * (10⁶). The oracle inside this spec is the textbook window/join
  * formulation of each query evaluated on the same rows — a different
  * plan, same semantics.
  */
class HotKeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 10⁶ hot-user events across ~100 days (10⁴/day), plus normal users
    * whose events straddle day boundaries (boundary-gap edge) and carry
    * duplicate timestamps (tie edge). */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("grafthot").toString
    val base = 1700000000L * 1000000L // fixed epoch micros
    val day = 86400L * 1000000L
    val hot = spark.range(1000000L).select(
      (col("id") + 10000000L).as("event_id"),
      timestamp_micros(lit(base) + col("id") * 8640000L + (col("id") % 7L))
        .as("ts"), // ~10⁴/day with non-uniform sub-second jitter
      lit(1L).as("user_id"),
      element_at(
        array(lit("view"), lit("click"), lit("purchase"), lit("other")),
        (col("id") % 4L + 1L).cast("int")).as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
    val normal = spark.range(5000L).select(
      col("id").as("event_id"),
      // 500 events per user in adjacent-index PAIRS sharing a timestamp
      // (tie-order invariance), pairs ~14 h apart → day-boundary gaps
      timestamp_micros(lit(base) +
        ((col("id") % 500L) - (col("id") % 500L) % 2L) * 25200000000L)
        .as("ts"),
      (col("id") / 500L + 100L).cast("long").as("user_id"),
      element_at(
        array(lit("view"), lit("click"), lit("purchase"), lit("other")),
        (col("id") % 4L + 1L).cast("int")).as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
    hot.unionByName(normal).coalesce(4)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def gapOracle(e: DataFrame): DataFrame = {
    e.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_s",
        expr("(us - lag(us, 1) OVER (PARTITION BY user_id " +
          "ORDER BY us, event_id)) DIV 1000000"))
      .filter(col("gap_s").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum("gap_s").as("total_gap_s"),
        max("gap_s").as("max_gap_s"))
      .filter(col("n_gaps") >= 5)
  }

  private def funnelOracle(e: DataFrame): DataFrame = {
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val c = e.filter(col("event_type") === "click").as("e")
      .join(v, Seq("user_id")).filter(col("ts") > col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") > col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    Seq(("1_view", 0), ("2_view_click", 1), ("3_full_funnel", 2)).toDF(
      "stage", "i").as("s")
      .join(Seq(0 -> v.count(), 1 -> c.count(), 2 -> p.count())
        .toDF("i", "n_users"), Seq("i"))
      .select(col("stage"), col("n_users"))
  }

  for (name <- Seq("cb_gap_stats", "cb_gap_bucket"))
    test(s"$name matches the window oracle under a 10^6-event hot key") {
      val got = SparkEntry.queries(name)(spark, dir)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val want = gapOracle(Tables(spark, dir).events)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.length == want.length, s"${got.length} vs ${want.length}")
      got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
      // the hot user is present and carries the full gap count
      assert(got.exists(r => r._1 == 1L && r._2 == 999999L))
    }

  test("cb_funnel matches the join oracle under the hot key") {
    val got = SparkEntry.queries("cb_funnel")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = funnelOracle(Tables(spark, dir).events)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want, s"$got vs $want")
    assert(got("1_view") >= 1L) // sanity: funnel actually fires
  }
}
