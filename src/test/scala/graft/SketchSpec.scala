package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketches + skew tooling: HLL distinct-count accuracy bound; salted
  * join equivalence on a pathologically skewed key. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact per group") {
    val ev = Tables(spark, dir).events
    val both = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("salted join equals plain join under skew") {
    // 90% of rows share one key — the shape that melts a single reducer
    val large = (1 to 20000).map(i =>
      (if (i % 10 != 0) 1L else i.toLong % 50, i.toLong)).toDF("k", "payload")
    val small = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "label")
    val salted = Skew.saltedJoin(large, small, "k", salt = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), max(col("label")).as("l"))
    val plain = large.join(small, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), max(col("label")).as("l"))
    assert(salted.orderBy("k").collect().toSeq ==
      plain.orderBy("k").collect().toSeq)
  }

  test("salted two-pass top-k equals single-window top-k under skew") {
    // one hot group with 50k rows + many small ones — the worst case for
    // a single window partition
    val df = ((1 to 50000).map(i => ("hot", i.toLong, i % 997)) ++
      (1 to 500).map(i => (s"g${i % 37}", i.toLong, i % 31)))
      .toDF("g", "id", "v")
    val salted = Skew.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id")), k = 5, saltBuckets = 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val plain = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
    assert(salted.orderBy("g", "rk").collect().toSeq ==
      plain.orderBy("g", "rk").collect().toSeq)
    // groups smaller than k return every row, ranked
    assert(salted.filter(col("g") === "g1").count() ==
      plain.filter(col("g") === "g1").count())
    // both window passes are present and the first is salt-partitioned
    // (inspect the optimized logical plan — AQE wraps the physical one)
    val windows = salted.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 2, s"expected 2 window passes, saw ${windows.size}")
    assert(windows.exists(_.partitionSpec.size == 2),
      "first pass must partition by (group, salt)")
  }
}
