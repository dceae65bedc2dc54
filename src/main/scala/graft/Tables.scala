package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file per table under the sf dir.
  */
final case class Tables(spark: SparkSession, sfDir: String) {
  private def t(name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    // Parquet schema inference runs a listing+footer job per read; cache the
    // schema per path so repeated query invocations skip it entirely.
    val schema = Tables.schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read it as a long (legacy nanosAsLong) and truncate to µs,
    * matching DuckDB's ns→µs semantics for every grain we query at. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.expr(
        "TIMESTAMP_MICROS(CAST(ts DIV 1000 AS BIGINT))"))
  }
  /** events with `ts` left as the raw TIMESTAMP(NANOS) long — for
    * queries that bucket time arithmetically (one integer op per row
    * beats a per-row timestamp conversion; the conversion then runs on
    * the handful of group keys after the agg). */
  def eventsRawNanos: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()
}
