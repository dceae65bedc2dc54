package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named query: a Spark implementation over the testdata star schema and
  * (when SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * The driver hash-compares the Spark result against the oracle result with
  * columns sorted by name — so every computed column must carry the SAME
  * alias in both, and types must line up (long vs int, decimal scales).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[QueryDef]
}

/** Shared helpers for cross-engine (Spark vs DuckDB) bit-identical results.
  *
  * Money/measure arithmetic on doubles is NOT reproducible across engines
  * (summation order differs), so: cast inputs to fixed-scale decimals
  * (deterministic per-value rounding), aggregate exactly in decimal, and
  * cast the final result to double (deterministic). Both engines then agree
  * bit-for-bit.
  */
object QueryDsl {
  // ---- scaled-long exact aggregation --------------------------------------
  // Money/rate columns hold 2-/4-decimal values stored as doubles. Scaling
  // them to integers (round(x*10^s)) is deterministic per value in both
  // engines, long sums are exact and order-independent AND the fastest
  // aggregation path (plain long codegen — ~2.3× faster than decimal sums).
  // The final rescale runs the identical IEEE double expression tree in both
  // engines, so results are bit-identical.

  // floor(x·s + 0.5) == round-half-away for values that are not exactly at
  // a .5 boundary — true for ≤2/4-decimal source data, where x·s lands on
  // an integer ± ulp. Unlike round(), it stays in pure double codegen (no
  // per-row BigDecimal), and the oracle SQL uses the identical formula.
  /** value ×100 as long (money, 2-decimal) */
  def sl2(c: Column): Column = floor(c * 100 + 0.5).cast("long")
  /** value ×10000 as long (rates, ≤4-decimal) */
  def sl4(c: Column): Column = floor(c * 10000 + 0.5).cast("long")
  /** long sum → double at given inverse scale, e.g. lsum(x, 1e6) = Σx/1e6 */
  def lsum(c: Column, inv: Double): Column = sum(c).cast("double") / inv

  /** oracle-SQL twins (same arithmetic tree, DuckDB dialect) */
  def oSl2(x: String): String = s"CAST(FLOOR(($x)*100 + 0.5) AS BIGINT)"
  def oSl4(x: String): String = s"CAST(FLOOR(($x)*10000 + 0.5) AS BIGINT)"
  def oLsum(x: String, inv: String): String =
    s"CAST(CAST(SUM($x) AS BIGINT) AS DOUBLE) / $inv"

  /** Σ price·(1−disc) — exact, as double. */
  def revenue(price: Column, disc: Column): Column =
    lsum(sl2(price) * (lit(10000L) - sl4(disc)), 1e6)
  def oRevenue(price: String, disc: String): String =
    oLsum(s"${oSl2(price)} * (10000 - ${oSl4(disc)})", "1000000.0")

  /** money-ish column (2 decimal places in the source data). Precision kept
    * small so products of three factors stay inside DecimalType.MAX_PRECISION
    * (38) without engine-specific precision-loss rounding. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** rate-ish column (discount/tax, 2-4 decimal places) */
  def dec4(c: Column): Column = c.cast(DecimalType(8, 4))
  /** Exact decimal sum rendered as double. The sum is first rescaled to 2
    * decimal places so the unscaled long fits in 2^53 — DuckDB's
    * int128→double conversion then agrees bit-for-bit with the JVM's
    * BigDecimal.doubleValue (both correctly rounded; at high scales DuckDB
    * double-rounds and drifts 1 ulp). */
  def dsum(c: Column): Column =
    sum(c).cast(DecimalType(38, 2)).cast("double")
  val one: Column = lit(1).cast(DecimalType(8, 4))

  // ---- scale-safe broadcast hints -----------------------------------------
  /** `broadcast(df)` gated on a conservative size estimate of the side
    * being built, derived from PROBLEM knowledge (the on-disk footprint
    * of the base table that bounds a derived relation) instead of the
    * optimizer's propagated estimate — which inherits the fact-table
    * size through aggregates, the q17 estimate-blindness that motivated
    * the hints in the first place.
    *
    * Under the cap the hint pins the measured bench-scale plan exactly
    * as before; over the cap the df is returned UNHINTED so the planner
    * falls back to a shuffle strategy. This matters because an explicit
    * broadcast() hint is honored at ANY size — AQE never demotes it —
    * so an unconditional hint on a side that grows with scale factor
    * (a 3-month orders slice, a |part|-bounded aggregate) would OOM the
    * driver at 100 TB (VERDICT r13 item 3).
    *
    * Cap: spark.graft.broadcast.cap bytes, default 256 MB of estimated
    * on-disk footprint. Parquet→UnsafeHashedRelation inflation is
    * roughly 3–5×, so 256 MB on disk stays near ~1 GB built — inside a
    * sane executor budget and ~8× under Spark's 8 GB broadcast-relation
    * hard cap. The crossover SFs per query are documented in SCALE.md. */
  def boundedBroadcast(df: DataFrame, estBytes: Long): DataFrame = {
    val cap = df.sparkSession.conf
      .getOption("spark.graft.broadcast.cap")
      .map(_.toLong).getOrElse(256L << 20)
    if (estBytes <= cap) broadcast(df) else df
  }
}
