package graft

import graft.sources.{GraftRelation, GraftSource}
import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister,
  RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Registers the `graft` format: `spark.read.format("graft")`,
  * `df.write.format("graft")` and the streaming CDC source
  * `spark.readStream.format("graft")` (see [[graft.sources.GraftSource]]
  * and [[graft.streaming.ChangeFeedStreamSource]] for the option
  * surface). Spark's provider lookup resolves
  * `format("graft")` → `graft.DefaultSource`. */
class DefaultSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val lake = GraftSource.lakeFor(sqlContext, parameters)
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("option table is required"))
    val cur = lake.currentSnapshotId()
    (shortName(), lake.tableChanges(table, cur, cur).schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val lake = GraftSource.lakeFor(sqlContext, parameters)
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("option table is required"))
    new graft.streaming.ChangeFeedStreamSource(sqlContext, lake, table,
      parameters.get("startVersion").map(_.toLong).getOrElse(0L),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong))
  }

  /** `df.writeStream.format("graft").option("table", t)` — streaming
    * ingestion with the same atomic exactly-once batch ledger as
    * [[graft.streaming.LakeSink]]: one lake snapshot per micro-batch,
    * replayed batches skipped via the (ledgerKey, batchId) marker that
    * commits with the files.
    *
    * The ledger key defaults to the streaming QUERY ID, which Spark
    * persists in the checkpoint (same id across restarts of one query
    * lifetime; a fresh checkpoint mints a new id) — so restarting with a
    * new checkpoint can never collide with the old ledger and silently
    * skip batches. An explicit `queryName` option overrides it for
    * pipelines that intentionally continue one ledger across
    * checkpoints; regressing batch ids under that override fail loudly
    * in [[graft.streaming.LakeSink.appendBatch]]. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      "the graft streaming sink supports Append mode only")
    val lake = GraftSource.lakeFor(sqlContext, parameters)
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("option table is required"))
    val explicitName = parameters.get("queryName")
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val ledgerKey = explicitName.orElse {
          // Set by StreamExecution on the query's thread for every batch;
          // stable across restarts from the same checkpoint.
          Option(data.sparkSession.sparkContext.getLocalProperty(
            org.apache.spark.sql.execution.streaming.runtime
              .StreamExecution.QUERY_ID_KEY))
        }.getOrElse(throw new IllegalStateException(
          "graft sink: no streaming query id on this thread and no " +
          "explicit queryName option — cannot key the exactly-once ledger"))
        // upgrade compatibility: pipelines written BEFORE the query-id
        // keying recorded batches under 'graft-sink-<table>'. A crash
        // replay straddling the upgrade re-presents exactly the LAST
        // batch the old ledger committed — honor that one (equality
        // only: anything lower is a fresh checkpoint's new lifetime and
        // must NOT be skipped, the bug the query-id keying fixed).
        if (explicitName.isEmpty) {
          val opts = lake.options()
          def last(key: String): Long = opts.collectFirst {
            case (k, v) if k == s"stream_last_batch:$key:$table" => v.toLong
          }.getOrElse(-1L)
          // only before the new ledger has its first entry: a fresh
          // lifetime always starts at batch 0, so a first-presented
          // batch EQUAL to the legacy high-water mark (>0) can only be
          // the pre-upgrade checkpoint continuing
          if (batchId == last(s"graft-sink-$table") &&
              batchId >= 0L && last(ledgerKey) == -1L) return
        }
        val batch = org.apache.spark.sql.graftshim.DatasetBridge
          .asBatch(data.sparkSession, data)
        graft.streaming.LakeSink.appendBatch(lake, table, ledgerKey,
          batchId, batch): Unit
      }
      override def toString: String = s"GraftLakeSink($table)"
    }
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val lake = GraftSource.lakeFor(sqlContext, parameters)
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("option table is required"))
    new GraftRelation(sqlContext, lake, table,
      parameters.get("version").map(_.toLong),
      parameters.get("timestamp").map(_.toLong))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val lake = GraftSource.lakeFor(sqlContext, parameters)
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("option table is required"))
    val exists = scala.util.Try(lake.schemaOf(table)).isSuccess
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"table $table already exists")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Overwrite =>
        if (exists) {
          // snapshot-versioned truncate + append (old data stays
          // reachable via time travel, like the reference's DML model)
          lake.delete(table, org.apache.spark.sql.functions.lit(true))
          lake.append(table, data)
        } else lake.createTableAs(table, data)
      case _ => // Append / ErrorIfExists / Ignore on a fresh table
        if (exists) lake.append(table, data)
        else lake.createTableAs(table, data)
    }
    createRelation(sqlContext, parameters)
  }
}
