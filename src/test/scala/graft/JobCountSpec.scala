package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-efficiency regressions: operators that must execute as ONE Spark
  * job (no hidden driver-side actions that re-scan inputs). A funnel that
  * issues one job per stage scans the events table once per stage; at corpus
  * scale that multiplies the dominant cost (the scan) by the stage count. */
class JobCountSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** AQE materializes each query stage as its own job, which would hide a
    * driver-side-action regression behind a constant; count with AQE off so
    * one query == one job exactly. */
  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def jobsDuring(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // listener bus is async; drain it before reading the counter
      org.apache.spark.graft.ShuffleReset.drainListenerBus(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    jobs.get()
  }

  // warm the parquet schema-inference cache (a one-task footer-read job at
  // first `spark.read.parquet` per path) so the counts below isolate query
  // construction + execution
  private def warm(name: String): Unit =
    SparkEntry.queries(name)(spark, dir): Unit

  test("cb_funnel executes as a single Spark job") {
    withoutAqe {
      warm("cb_funnel")
      // count over construction AND execution: the old funnel ran three
      // driver `count()` actions during construction (3 jobs, events
      // scanned per stage) — this pins the single-job plan
      val n = jobsDuring {
        SparkEntry.queries("cb_funnel")(spark, dir).collect(): Unit
      }
      assert(n == 1, s"cb_funnel ran $n jobs; expected 1")
    }
  }

  test("cb_gap_stats executes as a single Spark job") {
    withoutAqe {
      warm("cb_gap_stats")
      val n = jobsDuring {
        SparkEntry.queries("cb_gap_stats")(spark, dir).collect(): Unit
      }
      assert(n == 1, s"cb_gap_stats ran $n jobs; expected 1")
    }
  }
}
