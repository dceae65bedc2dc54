package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom per-key state — the
  * `flatMapGroupsWithState` surface of Structured Streaming (SURVEY.md
  * §2b streaming row): events group by user, a session closes after a
  * 30-minute (configurable) event-time gap, and each CLOSED session is
  * emitted exactly once with its event count and duration.
  *
  * State per user is O(1) — session start, last event time, count — so a
  * 100 TB/day event stream shards across executors by user hash with
  * bounded state; watermark-driven timeouts evict idle users (no
  * unbounded state growth). The batch twin of this operator is
  * `CorpusQueries.session_stats` (same gap semantics, oracle-checked);
  * this streaming form trades the second shuffle for incremental state.
  */
object Sessionize {

  /** input event: user + event-time microseconds. `ts` carries the
    * WATERMARKED timestamp attribute through to the stateful operator —
    * project it away and Spark rejects EventTimeTimeout ("watermark must
    * be specified"); the session logic itself uses the exact µs long. */
  final case class Event(userId: Long, us: Long, ts: java.sql.Timestamp)

  /** one closed session */
  final case class Session(userId: Long, startUs: Long, nEvents: Long,
      durS: Long)

  /** per-user open-session state (public: the state Encoder's generated
    * code constructs and reads it reflectively) */
  final case class SessState(startUs: Long, lastUs: Long, n: Long)

  /** Close out sessions for one user given new events + state. Emits
    * sessions closed either by a gap WITHIN the batch or by event-time
    * timeout (watermark passed last event + gap). */
  private def updateUser(gapUs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessState]): Iterator[Session] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = state.getOption.orNull
    if (events.isEmpty && state.hasTimedOut) {
      // watermark passed lastUs + gap with no new events: close the session
      if (cur != null)
        out += Session(userId, cur.startUs, cur.n, (cur.lastUs - cur.startUs) / 1000000L)
      state.remove()
    } else {
      // event-time order within the batch (micro-batches are unordered)
      for (e <- events.toSeq.sortBy(_.us)) {
        if (cur == null) cur = SessState(e.us, e.us, 1)
        else if (e.us - cur.lastUs > gapUs) {
          out += Session(userId, cur.startUs, cur.n, (cur.lastUs - cur.startUs) / 1000000L)
          cur = SessState(e.us, e.us, 1)
        } else cur = SessState(math.min(cur.startUs, e.us),
          math.max(cur.lastUs, e.us), cur.n + 1)
      }
      state.update(cur)
      // timeout once the watermark passes the would-be session end (must
      // stay ahead of the current watermark or Spark rejects it)
      state.setTimeoutTimestamp(math.max(
        state.getCurrentWatermarkMs + 1, (cur.lastUs + gapUs) / 1000L))
    }
    out.iterator
  }

  /** Attach sessionization to a (possibly streaming) Dataset[Event] that
    * already carries a watermark on its event-time column. Output mode
    * must be Append (sessions are final when emitted). */
  def sessions(events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val ste = Encoders.product[SessState]
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateUser(gapUs))
  }

  /** Convenience: wrap a raw streaming DataFrame with (user_id, ts
    * timestamp) columns — adds the watermark and the typed projection. */
  def fromStream(df: org.apache.spark.sql.DataFrame,
      gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    implicit val ee = Encoders.product[Event]
    val typed = df
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("userId"), unix_micros(col("ts")).as("us"),
        col("ts"))
      .as[Event]
    sessions(typed, gapMinutes)
  }
}
