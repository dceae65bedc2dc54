package graft.streaming

import graft.catalog.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming ingestion INTO a lake table — the write-side
  * counterpart of [[ChangeFeed]] (the reference only reads changes; a
  * Spark-native lake naturally accepts `writeStream` too).
  *
  * Exactly-once: Spark's foreachBatch replays a batch after failure, so
  * each (query, batchId) is recorded in catalog metadata and replayed
  * batches are skipped — append becomes idempotent per batch. Every
  * committed batch is one lake snapshot (streaming micro-batch ≡ the
  * reference's statement-level snapshot granularity).
  *
  * At scale the append itself is a distributed parquet write; only the
  * batch-id bookkeeping touches the catalog (one row per batch).
  */
object LakeSink {

  /** Idempotent per-batch append used by the sink; public so tests (and
    * custom foreachBatch pipelines) can drive it directly. Returns true
    * when the batch was applied, false when it was a replayed duplicate.
    *
    * The (queryName, batchId) marker commits in the SAME catalog
    * transaction as the appended files (and is re-checked inside the
    * conflict-checked commit), so a crash can never land the data without
    * the marker — the append is atomic-exactly-once per batch. */
  def appendBatch(lake: Lake, table: String, queryName: String,
      batchId: Long, batch: DataFrame): Boolean = {
    val key = s"stream_last_batch:$queryName:$table"
    val last = lake.options().collectFirst {
      case (k, v) if k == key => v.toLong
    }.getOrElse(-1L)
    if (batchId == last) false // post-commit replay of the same batch
    else if (batchId < last)
      // A replay can only re-present the LAST committed batch. Anything
      // earlier means a different query lifetime is reusing this ledger
      // key (e.g. a restart with a fresh checkpoint, where batch ids
      // restart at 0, under an explicit shared queryName) — skipping
      // would silently drop data, so refuse instead.
      throw new IllegalStateException(
        s"streaming ledger '$key' is at batch $last but batch $batchId " +
        "arrived: batch ids regressed by more than a single replay. " +
        "This usually means the query was restarted with a NEW checkpoint " +
        "while keeping the old queryName. Use a fresh queryName (or drop " +
        "the option to key the ledger on the checkpoint's query id).")
    else
      try {
        lake.append(table, batch,
          commitOptions = Seq(key -> batchId.toString),
          batchGuard = Some((key, batchId)))
        true
      } catch {
        case _: graft.catalog.DuplicateBatchException => false
      }
  }

  /** Attach a streaming DataFrame to a lake table. Caller starts the
    * returned writer (and may set its own trigger/checkpoint options). */
  def into(lake: Lake, table: String, stream: DataFrame,
      queryName: String): DataStreamWriter[Row] =
    stream.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(lake, table, queryName, batchId, batch): Unit
      }

  /** Convenience: drain all currently-available input into the table
    * (AvailableNow), blocking until done. */
  def ingestAvailable(lake: Lake, table: String, stream: DataFrame,
      queryName: String, checkpointDir: String): StreamingQuery = {
    val q = into(lake, table, stream, queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
