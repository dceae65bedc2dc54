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
}
