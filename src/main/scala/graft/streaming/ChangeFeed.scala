package graft.streaming

import graft.catalog.Lake
import org.apache.spark.sql.DataFrame

/** Incremental change-feed consumption on top of the snapshot-diff CDC
  * functions (reference's table_changes surface, SURVEY.md §2.6) — the
  * Structured-Streaming-flavored bonus: a driver-side micro-batch poller
  * with explicit offsets (snapshot ids), the same contract a DSv2
  * MicroBatchStream would expose (latestOffset = current snapshot,
  * getBatch(start, end) = tableChanges).
  *
  * Each batch is a DataFrame of row changes with change_type / rowid /
  * snapshot_id columns; offsets are durable snapshot ids, so consumers can
  * checkpoint and resume exactly-once by persisting the last processed id.
  */
final class ChangeFeed(lake: Lake, table: String, startVersion: Long,
    maxSnapshotsPerBatch: Option[Long] = None) {

  require(maxSnapshotsPerBatch.forall(_ > 0),
    "maxSnapshotsPerBatch must be positive")

  @volatile private var lastVersion: Long = startVersion

  /** current committed offset of the feed source */
  def latestOffset(): Long = lake.currentSnapshotId()

  /** the last snapshot id this feed has emitted through */
  def currentVersion: Long = lastVersion

  /** Pull the next micro-batch, if any: changes in (lastVersion, end]
    * where end is the latest snapshot capped by `maxSnapshotsPerBatch` —
    * the maxFilesPerTrigger analog: a feed recovering from a long pause
    * catches up in bounded batches instead of one giant replay (each
    * batch's size stays executor-memory-plannable at 100 TB). Returns the
    * batch with its end offset; advances the feed. */
  def nextBatch(): Option[(Long, DataFrame)] = synchronized {
    val latest = latestOffset()
    if (latest <= lastVersion) None
    else {
      val end = maxSnapshotsPerBatch
        .map(m => math.min(latest, lastVersion + m)).getOrElse(latest)
      val batch = lake.tableChanges(table, lastVersion, end)
      lastVersion = end
      Some((end, batch))
    }
  }

  /** Poll until `untilVersion` is reached, invoking `process` per batch
    * (AvailableNow-style drain when untilVersion = latestOffset()). */
  def drain(process: (Long, DataFrame) => Unit): Int = {
    var n = 0
    var more = true
    while (more) {
      nextBatch() match {
        case Some((v, df)) => process(v, df); n += 1
        case None => more = false
      }
    }
    n
  }
}

object ChangeFeed {
  /** Open a feed from a known offset (e.g. a consumer checkpoint);
    * `maxSnapshotsPerBatch` bounds catch-up batch size. */
  def apply(lake: Lake, table: String, fromVersion: Long,
      maxSnapshotsPerBatch: Option[Long] = None): ChangeFeed =
    new ChangeFeed(lake, table, fromVersion, maxSnapshotsPerBatch)
}
