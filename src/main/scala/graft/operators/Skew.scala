package graft.operators

import org.apache.spark.sql.DataFrame
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
}
