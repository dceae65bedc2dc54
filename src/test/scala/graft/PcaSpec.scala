package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA: the distributed one-pass moments + Jacobi eigensolver must agree
  * with a direct local computation on a small slice, and the model must
  * satisfy the spectral invariants the oracle booleans assert. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("components are orthonormal, eigenvalues descending") {
    val e = Tables(spark, dir).embeddings
    val m = Pca.fit(e, "embedding", 6)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    for (i <- m.components.indices; j <- 0 to i) {
      val dot = m.components(i).zip(m.components(j))
        .map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-7, s"<v$i,v$j> = $dot")
    }
  }

  test("projected variance equals eigenvalue; matches local computation") {
    val rows = Tables(spark, dir).embeddings.limit(200).cache()
    val m = Pca.fit(rows, "embedding", 3)
    // local exact covariance on the same 200 rows
    val data = rows.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = data.length
    val d = data.head.length
    val mean = Array.tabulate(d)(i => data.map(_(i)).sum / n)
    for (j <- 0 until 3) {
      val v = m.components(j)
      // variance of projections computed directly
      val projs = data.map(x =>
        x.indices.map(i => (x(i) - mean(i)) * v(i)).sum)
      val mu = projs.sum / n
      val varc = projs.map(p => (p - mu) * (p - mu)).sum / n
      assert(math.abs(varc - m.eigenvalues(j)) < 1e-8 * math.max(1.0, m.eigenvalues(j)),
        s"component $j: local var $varc vs eigenvalue ${m.eigenvalues(j)}")
    }
    // top eigenvalue dominates any random direction's variance
    val rnd = new scala.util.Random(7)
    val rv0 = Array.fill(d)(rnd.nextGaussian())
    val nrm = math.sqrt(rv0.map(x => x * x).sum)
    val rv = rv0.map(_ / nrm)
    val rproj = data.map(x => x.indices.map(i => (x(i) - mean(i)) * rv(i)).sum)
    val rmu = rproj.sum / n
    val rvar = rproj.map(p => (p - rmu) * (p - rmu)).sum / n
    assert(m.eigenvalues(0) >= rvar - 1e-9)
  }

  test("transform output length and reconstruction sanity") {
    val e = Tables(spark, dir).embeddings
    val m = Pca.fit(e, "embedding", 4)
    val p = Pca.transform(e, "embedding", m)
      .select(size(col("proj")).as("k"))
      .agg(min("k"), max("k")).collect()(0)
    assert(p.getInt(0) == 4 && p.getInt(1) == 4)
  }
}
