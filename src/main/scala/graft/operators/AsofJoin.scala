package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — the reference engine's temporal join (DuckDB `ASOF JOIN`,
  * delegated surface SURVEY.md §2b) that Spark lacks as a built-in.
  *
  * For each left row, picks the right row with the greatest right.ts ≤
  * left.ts within the same key (inclusive, matching DuckDB's
  * `ON l.k = r.k AND l.ts >= r.ts`).
  *
  * Spark-first composition instead of a nested-loop: both sides union into
  * one stream tagged by side, ONE shuffle partitions by key and sorts by
  * (ts, side) — right rows sort before left rows at equal ts — and a
  * running `last(_, ignoreNulls)` window carries the newest right payload
  * forward to each left row. O(n log n) per partition, no row
  * amplification, skew bounded by the hottest key (the same bound any
  * per-key window has). */
object AsofJoin {

  /** `rightSuffix` renames the right payload columns; `inner` drops left
    * rows with no match (default keeps them with NULLs — ASOF LEFT). */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightSuffix: String = "_r", inner: Boolean = false): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filterNot(c => c == key || c == ts)
    val r = right.select(col(key), col(ts).as("__ts"),
      struct(rCols.map(col): _*).as("__r"), lit(0).as("__side"))
    val l = left.withColumn("__ts", col(ts)).withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val base = if (inner) matched.filter(col("__match").isNotNull)
    else matched
    base.select(lCols.map(col) ++
      rCols.map(c => col(s"__match.$c").as(c + rightSuffix)): _*)
  }
}
