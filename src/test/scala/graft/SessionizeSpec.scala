package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState sessionization: gap-closed sessions within a
  * batch, state carried across batches, and watermark-timeout closes. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // day-one base: an event AT the initial watermark (t=0) is filtered as
  // late by the stateful operator, so keep all event times past it
  private def us(minutes: Long): Long = (minutes + 1440L) * 60L * 1000000L

  test("sessions close on gap, carry across batches, and time out") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (user_id, event-time µs)
    val events = in.toDF().toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val sessions = Sessionize.fromStream(events, gapMinutes = 30,
      watermarkDelay = "0 seconds")
    val qn = s"sessspec_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(qn).start()
    try {
      // batch 1: user 1 has two events 10 min apart (one session), then a
      // 40-min gap and one more event -> first session closes in-batch
      in.addData((1L, us(0)), (1L, us(10)), (1L, us(50)))
      q.processAllAvailable()
      val afterB1 = spark.table(qn).as[(Long, Long, Long, Long)].collect()
      assert(afterB1.toSet == Set((1L, us(0), 2L, 10L * 60)))

      // batch 2: an event 5 min after the open session's last -> extends
      // it (no new close); another user starts
      in.addData((1L, us(55)), (2L, us(60)))
      q.processAllAvailable()
      assert(spark.table(qn).count() == 1)

      // batch 3: far-future event advances the watermark past both open
      // sessions' end + gap -> both close via EventTimeTimeout
      in.addData((3L, us(600)))
      q.processAllAvailable()
      // one more batch so the timed-out state is processed
      in.addData((3L, us(601)))
      q.processAllAvailable()
      val closed = spark.table(qn).as[(Long, Long, Long, Long)].collect().toSet
      assert(closed.contains((1L, us(50), 2L, 5L * 60)),
        s"user 1 second session must time out: $closed")
      assert(closed.contains((2L, us(60), 1L, 0L)),
        s"user 2 session must time out: $closed")
    } finally q.stop()
  }

  test("late-but-within-watermark events cannot shrink the session window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val events = in.toDF().toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val sessions = Sessionize.fromStream(events, gapMinutes = 30,
      watermarkDelay = "2 hours")
    val qn = s"sessspec_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(qn).start()
    try {
      // open session: events at t=0 and t=20 → last = 20
      in.addData((1L, us(0)), (1L, us(20)))
      q.processAllAvailable()
      // batch 2 delivers an OLDER event (t=10, within the 2h watermark):
      // must not rewind the session's end back to t=10
      in.addData((1L, us(10)))
      q.processAllAvailable()
      // t=45 is 25 min after the true last event (t=20) → same session;
      // a rewound lastUs (t=10) would see a 35-min gap and wrongly split
      in.addData((1L, us(45)))
      q.processAllAvailable()
      // advance the watermark far past end+gap, then flush the timeout
      in.addData((9L, us(600)))
      q.processAllAvailable()
      in.addData((9L, us(601)))
      q.processAllAvailable()
      val closed = spark.table(qn).as[(Long, Long, Long, Long)].collect()
        .filter(_._1 == 1L).toSet
      assert(closed == Set((1L, us(0), 4L, 45L * 60)),
        s"expected ONE un-split session for user 1, got $closed")
    } finally q.stop()
  }
}
