package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (range) join — the reference engine plans inequality joins with a
  * specialized operator (DuckDB IEJoin); Spark's fallback is a nested
  * loop. This is the Spark-first scale path: bucketize both sides by the
  * band width, equi-join on the bucket id (right side expands to its
  * ±1 neighbor buckets — constant 3× amplification), then apply the exact
  * predicate. The nested loop's O(n·m) becomes a hash join over
  * co-bucketed rows: one shuffle per side, work proportional to true
  * candidate pairs. */
object RangeJoin {

  /** Pairs (l, r) with |l.lv − r.rv| ≤ band. */
  def bandJoin(left: DataFrame, right: DataFrame, lv: String, rv: String,
      band: Double): DataFrame = {
    require(band > 0, "band must be positive")
    def bucket(c: Column): Column = floor(c / lit(band)).cast("long")
    val l = left.withColumn("__b", bucket(col(lv)))
    val r = right.withColumn("__rb", bucket(col(rv)))
      .withColumn("__b", explode(array(col("__rb") - 1, col("__rb"),
        col("__rb") + 1)))
      .drop("__rb")
    l.join(r, Seq("__b"))
      .filter(abs(col(lv) - col(rv)) <= lit(band))
      .drop("__b")
  }
}
