package graft

import graft.operators.ShardPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed two-pass prefix sum must equal the naive
  * single-partition global window bit-for-bit, across partition counts
  * and at shard boundaries. */
class ShardPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame,
      capacity: Long): Map[Long, Long] = {
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pre", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("shard_id", expr(s"CAST(pre DIV $capacity AS BIGINT)"))
      .select("id", "shard_id").as[(Long, Long)].collect().toMap
  }

  test("matches the naive global window for several bucket widths") {
    val df = (1L to 997L).map(i => (i, s"k${(i * 37) % 1000}x", i % 50 + 1))
      .toDF("id", "k", "t")
    val want = naive(df, capacity = 500L)
    for (p <- Seq(1, 2, 3)) {
      val got = ShardPlan.assign(df, "id", col("t"), col("k"),
        capacity = 500L, prefixLen = p)
        .select("id", "shard_id").as[(Long, Long)].collect().toMap
      assert(got == want, s"diverged at prefixLen=$p")
    }
  }

  test("matches on uniform md5 keys (the intended shuffle order)") {
    val df = (1L to 500L).map(i => (i, i % 37 + 1)).toDF("id", "t")
      .withColumn("k", md5(concat(col("id").cast("string"), lit(":s"))
        .cast("binary")))
    val want = naive(df.select("id", "k", "t"), capacity = 300L)
    val got = ShardPlan.assign(df, "id", col("t"), col("k"),
      capacity = 300L)
      .select("id", "shard_id").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("shards cut exactly at the capacity boundary") {
    // 10 docs x 10 tokens, capacity 30: shards of 3 docs (preceding-sum
    // convention: doc with preceding 90 tokens → shard 3)
    val df = (1L to 10L).map(i => (i, f"$i%02d", 10L)).toDF("id", "k", "t")
    val got = ShardPlan.assign(df, "id", col("t"), col("k"),
      capacity = 30L, prefixLen = 1)
      .select("id", "shard_id").as[(Long, Long)].collect().toMap
    assert(got == (1L to 10L).map(i => i -> ((i - 1) * 10 / 30)).toMap)
  }

  test("plan has no single-partition global sort window") {
    val df = (1L to 100L).map(i => (i, s"k$i", 1L)).toDF("id", "k", "t")
    val out = ShardPlan.assign(df, "id", col("t"), col("k"),
      capacity = 10L)
    // the only window is partitioned by _pid — a global (empty
    // partition-spec) window would be the 100 TB bottleneck
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "found a window with an empty partition spec (global sort)")
  }
}
