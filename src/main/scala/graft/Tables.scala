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
  /** events.ts is parquet timestamp[us] (no tz annotation). Force a
    * TIMESTAMP (LTZ) read — the micros on disk are taken as UTC instants
    * verbatim, no adjustment — so every downstream `unix_micros` /
    * `date_format` / `window` keeps the exact semantics the oracles were
    * written against (DuckDB reads the same column as TIMESTAMP and
    * `epoch_us` agrees bit-for-bit). */
  def events: DataFrame = {
    val path = s"$sfDir/events.parquet"
    val inferred = Tables.schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    val schema = org.apache.spark.sql.types.StructType(inferred.map(f =>
      if (f.name == "ts")
        f.copy(dataType = org.apache.spark.sql.types.TimestampType)
      else f))
    spark.read.schema(schema).parquet(path)
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()
}
