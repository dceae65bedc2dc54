package graft

import org.apache.spark.sql.SparkSession

import graft.catalog.Lake
import graft.plans.{GraftExtensions, LakeRegistry}

/** One-call production session setup for lake workloads — the "attach
  * and query" experience of the reference, Spark-first:
  *
  * {{{
  * val spark = LakeSession.builder().master("local[*]").getOrCreate()
  * val lake  = LakeSession.attach(spark, "/cat", "s3a://bucket/data")
  * spark.sql("SELECT COUNT(*) FROM graft.events")   // pruned lake scan
  * }}}
  *
  * Defaults are the CLUSTER-scale ones (unlike Bench's local-microbench
  * knobs, which must never leak here): AQE on with skew-join handling —
  * at 100 TB the runtime re-plan is what absorbs stats drift and hot
  * keys — UTC session timezone (the lake's timestamp convention), and
  * the `graft` Catalyst extension + DSv2 catalog registered so plain
  * `spark.sql` gets DDL, DML, time travel, CALL procedures, and
  * stats-pruned scans. `spark.sql.shuffle.partitions` is left at
  * Spark's default/AQE-coalesced value on purpose: AQE right-sizes
  * reducer counts per query, which no static setting does across a
  * 100 TB query mix. */
object LakeSession {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // collect_list-style ObjectHashAggregates sort-fall-back after 128
      // groups per task by default — tuned for unbounded opaque buffers.
      // The engine's event plans bound every such buffer by construction
      // (per-(key, time-bucket) pre-folds, EventQueries), so the fallback
      // would only re-sort full inputs; 64k keeps the hash path while
      // still capping truly pathological group counts.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // storage-partitioned joins: lets a KeyGroupedPartitioning-
      // reporting scan (the spj catalog surface) join co-bucketed tables
      // with zero exchange; inert for every other scan
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.catalog.graft", "graft.sources.GraftTableCatalog")
      .withExtensions(new GraftExtensions)

  /** Attach a lake and register it for SQL resolution under `alias`. */
  def attach(spark: SparkSession, catalogDir: String, dataPath: String,
      alias: String = "graft"): Lake = {
    val lake = Lake.attach(spark, catalogDir, dataPath)
    LakeRegistry.register(alias, lake)
    lake
  }

  /** Unregister the alias (call when done with the lake). */
  def detach(alias: String = "graft"): Unit =
    LakeRegistry.unregister(alias)
}
