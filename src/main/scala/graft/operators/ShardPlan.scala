package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global token-budget shard assignment in one deterministic total order
  * — WITHOUT the single-partition window a naive `SUM() OVER (ORDER BY …)`
  * plans. The classic distributed prefix sum, with ORDER-ALIGNED buckets
  * derived from the order key itself:
  *
  *  1. bucket = fixed-length PREFIX of the (string) order key — a prefix
  *     is order-aligned by construction (every key in bucket "0a" sorts
  *     before every key in "0b"), so no range sampling is needed and the
  *     bucketing is a pure function of the data (bit-reproducible across
  *     jobs and retries — a sampled RangePartitioner is not),
  *  2. per-bucket running sums (windows partitioned by bucket — all
  *     buckets in parallel),
  *  3. per-bucket subtotals — one row per bucket — collected, cumulated
  *     on the driver in bucket order, broadcast back as offsets,
  *  4. global prefix = offset + local prefix; shard = prefix DIV capacity.
  *
  * At 100 TB the naive global window funnels every row through ONE task;
  * here the only sequential step is the ≤16^prefixLen-row offset scan.
  * Buckets are balanced when the order key is uniform — true for the
  * intended md5-shuffle keys (prefixLen 2 → 256 buckets; raise it for
  * larger clusters).
  */
object ShardPlan {

  /** @param orderKey total-order key as a STRING column — intended to be
    *                 a deterministic uniform shuffle key (e.g. md5 hex);
    *                 ties broken by `idCol`
    * @param prefixLen bucket = first `prefixLen` chars of the key
    * @return input id + `n_tokens` + `shard_id` (0-based, cut every
    *         `capacity` tokens of PRECEDING documents in global order) */
  def assign(docs: DataFrame, idCol: String, tokens: Column,
      orderKey: Column, capacity: Long, prefixLen: Int = 2): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(prefixLen > 0, "prefixLen must be positive")
    val spark = docs.sparkSession
    val base = docs
      .select(col(idCol), orderKey.cast("string").as("_okey"),
        tokens.as("_toks"))
      .withColumn("_bkt", substring(col("_okey"), 1, prefixLen))
    // per-bucket running sum of PRECEDING rows — parallel across buckets
    val w = Window.partitionBy(col("_bkt"))
      .orderBy(col("_okey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("_local",
      coalesce(sum(col("_toks")).over(w), lit(0L)))
    // one subtotal row per bucket → driver → exclusive cumulative offsets
    // in bucket (= key) order; deterministic because the bucket is a pure
    // function of the key
    val subtotals = base.groupBy(col("_bkt"))
      .agg(sum(col("_toks")).as("_sub"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = subtotals.map { case (b, sub) =>
      val off = acc; acc += sub; (b, off)
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("_bkt", "_off")
    // broadcast join on bucket: a narrow map-side add, no extra shuffle;
    // integer division keeps it exact at any corpus size
    local.join(broadcast(offDf), "_bkt")
      .withColumn("shard_id",
        expr(s"CAST((_off + _local) DIV $capacity AS BIGINT)"))
      .drop("_bkt", "_okey", "_local", "_off")
      .withColumnRenamed("_toks", "n_tokens")
  }
}
