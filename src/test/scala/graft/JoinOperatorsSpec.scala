package graft

import graft.operators.{AsofJoin, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AS-OF and band joins: semantics on hand-built cases + equivalence with
  * the naive formulation. */
class JoinOperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof picks greatest right ts <= left ts, inclusive; left keeps unmatched") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 101.0), (2L, 5L, 50.0))
      .toDF("k", "ts", "px")
    val trades = Seq((1L, 9L), (1L, 10L), (1L, 25L), (2L, 4L), (3L, 7L))
      .toDF("k", "ts")
    val got = AsofJoin.asof(trades, quotes, "k", "ts")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    assert(got == Seq(
      (1L, 9L, -1.0), // before any quote
      (1L, 10L, 100.0), // inclusive match at equal ts
      (1L, 25L, 101.0), // latest prior
      (2L, 4L, -1.0),
      (3L, 7L, -1.0))) // key with no right rows
    // inner variant drops the unmatched
    assert(AsofJoin.asof(trades, quotes, "k", "ts", inner = true)
      .count() == 2)
  }

  test("band join equals the naive cross-join formulation") {
    val a = (1 to 200).map(i => (i.toLong, i * 0.37)).toDF("ida", "va")
    val b = (1 to 150).map(i => (i.toLong, i * 0.53 - 3.0)).toDF("idb", "vb")
    val fast = RangeJoin.bandJoin(a, b, "va", "vb", band = 0.8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val naive = a.crossJoin(b)
      .filter(abs(col("va") - col("vb")) <= 0.8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }
}
