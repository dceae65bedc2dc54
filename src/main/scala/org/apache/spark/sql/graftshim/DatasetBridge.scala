package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql] Dataset.ofRows` — turns an analyzed logical
  * plan back into a DataFrame (needed by the SQL INSERT command, which
  * receives the parsed query as a plan). No logic, access only. */
object DatasetBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-wrap a batch DataFrame as a STREAMING DataFrame (isStreaming =
    * true) over its physical RDD — what a V1 streaming `Source.getBatch`
    * must return (the micro-batch engine splices this plan in place of
    * the streaming relation; FileStreamSource does the same). */
  def asStreaming(session: SparkSession, df: DataFrame): DataFrame = {
    val cs = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse: re-wrap the incremental DataFrame a V1 `Sink.addBatch`
    * receives as a plain BATCH DataFrame over its physical RDD, so the
    * sink can run ordinary batch writes on it (the standard V1 sink
    * pattern — the incoming frame still carries isStreaming = true and
    * would reject batch actions). */
  def asBatch(session: SparkSession, df: DataFrame): DataFrame = {
    val cs = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
