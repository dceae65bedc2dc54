package graft.streaming

import graft.catalog.Lake
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftshim.DatasetBridge
import org.apache.spark.sql.types.StructType

/** Structured Streaming CDC SOURCE over the lake
  * (`spark.readStream.format("graft")`): offsets are durable snapshot
  * ids, each micro-batch is `tableChanges(table, start, end]` — the
  * read-side twin of [[LakeSink]], completing the reference's CDC
  * surface (SURVEY.md §2.6 "optionally a Structured Streaming Source
  * that polls ducklake_snapshot and emits change batches").
  *
  * Options: `table`, `startVersion` (default 0 = full history replay),
  * `maxSnapshotsPerTrigger` (bounds catch-up batch size, the
  * maxFilesPerTrigger analog — a consumer recovering from a long pause
  * folds bounded deltas; reference change-feed rate limiting).
  *
  * Exactly-once: the engine checkpoints the end offset per batch and
  * replays `getBatch(start, end)` on recovery; `tableChanges` over a
  * fixed snapshot range is deterministic (immutable files + catalog
  * rows), so replays reproduce the batch bit-for-bit. The per-batch
  * plan scans only files whose `begin_snapshot` lies in range — at
  * 100 TB a feed batch reads the delta, never the table.
  */
final class ChangeFeedStreamSource(sqlContext: SQLContext, lake: Lake,
    table: String, startVersion: Long, maxSnapshotsPerTrigger: Option[Long])
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => OffsetV2, ReadLimit}

  private val spark = sqlContext.sparkSession
  // schema from an empty-range probe at the current snapshot
  override val schema: StructType = {
    val cur = lake.currentSnapshotId()
    lake.tableChanges(table, cur, cur).schema
  }

  /** AvailableNow boundary: snapshot captured at stream start, so the
    * run drains exactly the data present then — in bounded batches —
    * and terminates (FileStreamSource's allFiles analog). */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(lake.currentSnapshotId())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def version(o: AnyRef): Long = o match {
    case null => startVersion
    case l: LongOffset => l.offset
    case other: OffsetV2 => other.json.trim.toLong
  }

  /** admission control: advance at most `maxSnapshotsPerTrigger`
    * snapshots per micro-batch, never past the AvailableNow boundary */
  override def latestOffset(startOffset: OffsetV2,
      limit: ReadLimit): OffsetV2 = {
    val from = math.max(version(startOffset), startVersion)
    val latest = availableNowTarget.getOrElse(lake.currentSnapshotId())
    val end = maxSnapshotsPerTrigger
      .map(m => math.min(latest, from + m)).getOrElse(latest)
    if (end <= from) null else LongOffset(end)
  }

  /** legacy path — not called once SupportsAdmissionControl is present,
    * but kept correct for completeness */
  override def getOffset: Option[OffsetV1] = {
    val latest = lake.currentSnapshotId()
    if (latest <= startVersion) None else Some(LongOffset(latest))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(o => version(o)).getOrElse(startVersion)
    val to = version(end)
    DatasetBridge.asStreaming(spark, lake.tableChanges(table, from, to))
  }

  override def stop(): Unit = () // the lake is shared; nothing to close
}
