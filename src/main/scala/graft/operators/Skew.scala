package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew tooling: salting spreads a hot join key over `salt` sub-keys so
  * one executor no longer owns the whole key. The large side gets a
  * deterministic per-row salt (hash of all columns — no RNG state to
  * ship), the small side replicates `salt`× (bounded: it's the broadcast-
  * size side), and the equi-join runs on (key, salt). AQE's skew-join
  * split handles moderate skew automatically at runtime; salting is the
  * explicit tool for the pathological key that AQE cannot split further
  * (single-key partitions). */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salt)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe top-k per group: the single-window plan
    * (`row_number() OVER (PARTITION BY g ORDER BY …)`) is correct but its
    * worst case is ONE hot partition sorting an entire hot group on one
    * task. This variant salts the group into `saltBuckets` sub-partitions,
    * takes a local top-k per sub-partition (first window pass — bounded
    * sort, ≤ groupRows/saltBuckets per task in the worst case), then
    * re-ranks only the ≤ saltBuckets·k survivors per group (second pass —
    * tiny by construction). Results are identical to the single-window
    * plan whenever `order` is a total order within a group (add a
    * tie-breaker column if it isn't — same requirement the single-window
    * top-k has for deterministic output).
    *
    * The salt is a deterministic hash of ALL input columns, so task
    * retries re-derive the same bucket (no RNG state shipped) and exact
    * duplicate rows land in the same bucket (each survives or drops
    * together, like the unsalted plan). Output = input columns + `rankCol`
    * (LONG, 1-based). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], k: Int, saltBuckets: Int = 32,
      rankCol: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets))
    val local = Window
      .partitionBy((groupCols.map(col) :+ salt): _*)
      .orderBy(order: _*)
    val global = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(order: _*)
    df.withColumn("__lrk", row_number().over(local))
      .filter(col("__lrk") <= k) // ≤ saltBuckets·k rows per group survive
      .drop("__lrk")
      .withColumn(rankCol, row_number().over(global).cast("long"))
      .filter(col(rankCol) <= k)
  }
}
