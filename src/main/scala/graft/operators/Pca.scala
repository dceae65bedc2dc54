package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-component analysis over an `Array[Float]` embedding column,
  * built the way distributed linear algebra actually scales: the ONLY
  * corpus-sized work is one `mapPartitions` pass that folds each
  * partition into a (count, sum, Gram) triple — d + d² doubles, ~33 KB
  * at d=64 — so a 100 TB corpus reduces to `numPartitions` KB-sized rows
  * collected on the driver. The d×d eigenproblem is then solved locally
  * (cyclic Jacobi — deterministic, no library dependency) and the
  * projection back over the corpus is a map-only pass of k dot products
  * expressed as `zip_with`/`aggregate` column expressions (no UDF).
  *
  * This mirrors the texture of the reference's fixed-size-aggregate
  * philosophy (sketches collapse big data to small state; see
  * ducklake's stats collection, ducklake_data_file.hpp stats model) and
  * of Spark ML's own RowMatrix.computePrincipalComponents contract —
  * written from scratch against the public PCA definition.
  */
object Pca {

  final case class Model(
      n: Long,
      mean: Array[Double],
      /** row j = component j (orthonormal), sorted by eigenvalue desc */
      components: Array[Array[Double]],
      /** population variances along each component, descending */
      eigenvalues: Array[Double])

  /** One-pass (n, Σx, Σxxᵀ) moments; Gram stored dense row-major. Partial
    * triples are combined with `treeReduce` so the driver never sees more
    * than a handful of KB-sized states even with 10⁴ partitions. */
  private def moments(df: DataFrame, colName: String)
      : (Long, Array[Double], Array[Double]) = {
    val partials = df.select(col(colName)).rdd.mapPartitions { it =>
      var n = 0L
      var sum: Array[Double] = null
      var gram: Array[Double] = null
      while (it.hasNext) {
        val v = it.next().getSeq[Float](0)
        val d = v.length
        if (sum == null) { sum = new Array[Double](d); gram = new Array[Double](d * d) }
        var i = 0
        while (i < d) {
          val xi = v(i).toDouble
          sum(i) += xi
          var j = 0
          val row = i * d
          while (j < d) { gram(row + j) += xi * v(j).toDouble; j += 1 }
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty else Iterator.single((n, sum, gram))
    }
    partials.treeReduce({ case ((an, as, ag), (bn, bs, bg)) =>
      var i = 0
      while (i < as.length) { as(i) += bs(i); i += 1 }
      i = 0
      while (i < ag.length) { ag(i) += bg(i); i += 1 }
      (an + bn, as, ag)
    }, depth = 2)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix (row-major
    * dense). Returns (eigenvalues, eigenvectors as rows), unsorted. */
  private def jacobi(a0: Array[Double], d: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val a = a0.clone()
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += 2 * a(i * d + j) * a(i * d + j); j += 1 }; i += 1 }
      math.sqrt(s)
    }
    var sweep = 0
    while (off() > 1e-11 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (math.abs(apq) > 1e-300) {
            val app = a(p * d + p); val aqq = a(q * d + q)
            val theta = (aqq - app) / (2 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1); val s = t * c
            // rotate rows/cols p,q of a
            var k = 0
            while (k < d) {
              val akp = a(k * d + p); val akq = a(k * d + q)
              a(k * d + p) = c * akp - s * akq
              a(k * d + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p * d + k); val aqk = a(q * d + k)
              a(p * d + k) = c * apk - s * aqk
              a(q * d + k) = s * apk + c * aqk
              k += 1
            }
            // accumulate eigenvectors (rows of v)
            k = 0
            while (k < d) {
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i * d + i)), v)
  }

  /** Fit a k-component model: one distributed moments pass + local eigen. */
  def fit(df: DataFrame, colName: String, k: Int): Model = {
    val (n, sum, gram) = moments(df, colName)
    val d = sum.length
    require(k <= d, s"k=$k exceeds dimensionality $d")
    val mean = sum.map(_ / n)
    // population covariance: E[xxT] - mu muT
    val cov = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { cov(i * d + j) = gram(i * d + j) / n - mean(i) * mean(j); j += 1 }
      i += 1
    }
    val (evalsRaw, evecs) = jacobi(cov, d)
    // deterministic order: eigenvalue desc, then first-nonzero-positive sign
    val order = evalsRaw.zipWithIndex.sortBy { case (ev, idx) => (-ev, idx) }
    val top = order.take(k)
    val comps = top.map { case (_, idx) =>
      val vec = evecs(idx)
      val lead = vec.find(x => math.abs(x) > 1e-9).getOrElse(1.0)
      if (lead < 0) vec.map(-_) else vec.clone()
    }
    Model(n, mean, comps, top.map(_._1))
  }

  /** Project the embedding column onto the model's components — map-only,
    * UDF-free: each output coordinate is `Σ_i (x_i − μ_i)·v_ji` written as
    * zip_with + aggregate over an array literal (broadcast by codegen as a
    * constant — the model is KBs, not data). Output column `proj` is
    * `array<double>` of length k. */
  def transform(df: DataFrame, colName: String, model: Model): DataFrame = {
    val x = transform_shim(col(colName))
    val projCols = model.components.map { comp =>
      val vLit = typedLit(comp.toSeq)
      val muDot = comp.zip(model.mean).map { case (v, m) => v * m }.sum
      aggregate(
        zip_with(x, vLit, (a, b) => a * b),
        lit(0.0), (acc, e) => acc + e) - lit(muDot)
    }
    df.withColumn("proj", array(projCols: _*))
  }

  private def transform_shim(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.transform(c, x => x.cast("double"))
}
