package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the deterministic k-means / semantic-dedup
  * operators (the hash-exact cross-engine check is the driver's
  * `embed_kmeans` / `semantic_dedup` oracles). */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables(spark, dir).embeddings

  test("kMeans: deterministic, total, every cluster id in range") {
    val a1 = Similarity.kMeans(emb, "vec_id", "embedding", k = 4, iters = 2)
    val a2 = Similarity.kMeans(emb, "vec_id", "embedding", k = 4, iters = 2)
    val n = emb.count()
    assert(a1.count() === n) // total assignment: every vector labeled
    assert(a1.except(a2).isEmpty && a2.except(a1).isEmpty,
      "same input must produce the identical assignment")
    val cls = a1.select("cluster").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(cls.forall(c => c >= 0 && c < 4))
  }

  test("kMeans iterations reduce (never increase) total sq distance") {
    // Lloyd's monotonicity survives the integer rounding only
    // approximately, but 1 → 3 rounds must not make the clustering
    // worse on well-separated synthetic data: compare within-cluster
    // mean pairwise cosine (higher = tighter clusters).
    def tightness(iters: Int): Double = {
      val a = Similarity.kMeans(emb, "vec_id", "embedding", 4, iters)
      val s = emb.select(col("vec_id"),
        Similarity.scaled(col("embedding")).as("sv")).join(a, "vec_id")
      val l = s.select(col("cluster"), col("vec_id").as("ia"),
        col("sv").as("sa"))
      val r = s.select(col("cluster"), col("vec_id").as("ib"),
        col("sv").as("sb"))
      l.join(r, Seq("cluster")).filter(col("ia") < col("ib"))
        .agg(avg(Similarity.cosineScaled(col("sa"), col("sb"))))
        .head().getDouble(0)
    }
    assert(tightness(3) >= tightness(1) - 1e-9)
  }

  test("clusterMedoids: one representative per non-empty cluster, " +
      "and it is a member of its own cluster") {
    val m = Similarity.clusterMedoids(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val assigned = Similarity.kMeans(emb, "vec_id", "embedding", 4, 2)
    val rows = m.collect()
    assert(rows.map(_.getInt(0)).distinct.length === rows.length,
      "at most one medoid per cluster")
    val sizes = assigned.groupBy("cluster").count().count()
    assert(rows.length === sizes.toInt,
      "exactly one medoid per non-empty cluster")
    // each medoid is assigned to the cluster it represents
    val joined = m.join(assigned, "vec_id")
      .filter(m("cluster") =!= assigned("cluster")).count()
    assert(joined === 0)
  }

  test("pqEncode: total, in-range, deterministic; exact copies share codes") {
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding",
      m = 4, k = 8, iters = 2)
    assert(codes.count() === emb.count())
    assert(codes.columns.toSeq === Seq("vec_id", "code0", "code1",
      "code2", "code3"))
    (0 to 3).foreach { j =>
      val mx = codes.agg(max(col(s"code$j")), min(col(s"code$j"))).head()
      assert(mx.getLong(0) < 8 && mx.getLong(1) >= 0)
    }
    // an exact duplicate vector must encode to the identical code word
    val withCopy = emb.unionByName(
      emb.filter(col("vec_id") === 7).withColumn("vec_id", lit(888888L)))
    val c2 = Similarity.pqEncode(withCopy, "vec_id", "embedding", 4, 8, 2)
    val orig = c2.filter(col("vec_id") === 7).drop("vec_id").head()
    val copy = c2.filter(col("vec_id") === 888888L).drop("vec_id").head()
    assert(orig === copy)
  }

  test("pqAdcTopK: top-k shape, sorted distances, copy-of-query minimizes") {
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val base = emb.filter(col("vec_id") =!= 0)
    val top = Similarity.pqAdcTopK(base, "vec_id", "embedding", qv,
      topK = 10, m = 4, k = 8, iters = 2).collect()
    assert(top.length === 10)
    assert(top.map(_.getLong(0)).distinct.length === 10)
    val dists = top.map(_.getLong(1))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    // an exact copy of the query vector is assigned, per subspace, to the
    // centroid nearest the query — its ADC distance is the global minimum
    val withCopy = base.unionByName(
      emb.filter(col("vec_id") === 0).withColumn("vec_id", lit(777777L)))
    val top2 = Similarity.pqAdcTopK(withCopy, "vec_id", "embedding", qv,
      topK = withCopy.count().toInt, m = 4, k = 8, iters = 2).collect()
    val copyDist = top2.find(_.getLong(0) == 777777L).get.getLong(1)
    assert(top2.forall(_.getLong(1) >= copyDist))
  }

  test("plan shapes: no cartesian product anywhere; assignment stays " +
      "in whole-stage codegen") {
    val assigned = Similarity.kMeans(emb, "vec_id", "embedding", 4, 1)
    // codegen stages render as `*(n) Project ...` in the plan string
    val aPlan = assigned.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[vec_id""".r.findFirstIn(aPlan).isDefined,
      s"assignment projection left whole-stage codegen:\n$aPlan")
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding", 4, 1,
      threshold = 0.4)
    val dPlan = kept.queryExecution.executedPlan.toString
    assert(!dPlan.contains("CartesianProduct") &&
      !dPlan.contains("BroadcastNestedLoopJoin"),
      s"semanticDedup must stay cluster-blocked:\n$dPlan")
    val top = Similarity.pqAdcTopK(emb, "vec_id", "embedding",
      emb.select("embedding").head().getSeq[Float](0).toArray, 5,
      m = 4, k = 4, iters = 1)
    val tPlan = top.queryExecution.executedPlan.toString
    assert(tPlan.contains("TakeOrderedAndProject"),
      s"ADC top-k must be a map-side top-k, not a global sort:\n$tPlan")
    assert(!tPlan.contains("CartesianProduct"))
  }

  test("ivfPqTopK: probe subset of full ADC ranking; full probe = ADC") {
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val base = emb.filter(col("vec_id") =!= 0)
    val n = base.count().toInt
    // probing ALL coarse cells must reproduce the plain ADC ranking
    val full = Similarity.ivfPqTopK(base, "vec_id", "embedding", qv,
      topK = 10, kCoarse = 4, coarseIters = 1, m = 4, k = 4, iters = 1,
      nprobe = 4).collect().map(r => (r.getLong(0), r.getLong(1)))
    val adc = Similarity.pqAdcTopK(base, "vec_id", "embedding", qv,
      topK = 10, m = 4, k = 4, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(full.toSeq === adc.toSeq)
    // nprobe=1 returns only members of probed cells, still sorted
    val probed = Similarity.ivfPqTopK(base, "vec_id", "embedding", qv,
      topK = n, kCoarse = 4, coarseIters = 1, m = 4, k = 4, iters = 1,
      nprobe = 1).collect()
    assert(probed.length < n, "nprobe=1 must prune some cells")
    val d = probed.map(_.getLong(1))
    assert(d.zip(d.tail).forall { case (a, b) => a <= b })
  }

  test("semanticDedup: kept/dropped partition is exactly the shadow rule") {
    val tau = 0.40
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding",
      k = 4, iters = 2, threshold = tau)
    val assigned = Similarity.kMeans(emb, "vec_id", "embedding", 4, 2)
    val s = emb.select(col("vec_id"),
      Similarity.scaled(col("embedding")).as("sv")).join(assigned, "vec_id")
    val a = s.select(col("cluster"), col("vec_id").as("ia"),
      col("sv").as("sa"))
    val b = s.select(col("cluster"), col("vec_id").as("ib"),
      col("sv").as("sb"))
    val shadowed = a.join(b, Seq("cluster"))
      .filter(col("ia") < col("ib"))
      .filter(Similarity.cosineScaled(col("sa"), col("sb")) > tau)
      .select(col("ib").as("vec_id")).distinct()
    // kept = all − shadowed, exactly
    val expectKept = assigned.join(shadowed, Seq("vec_id"), "left_anti")
      .select("vec_id", "cluster")
    assert(kept.select("vec_id", "cluster").except(expectKept).isEmpty)
    assert(expectKept.except(kept.select("vec_id", "cluster")).isEmpty)
    // a planted exact copy is always dropped (cosine 1 > any τ)
    val withCopy = emb.unionByName(
      emb.filter(col("vec_id") === 1).withColumn("vec_id", lit(999999L)))
    val kept2 = Similarity.semanticDedup(withCopy, "vec_id", "embedding",
      k = 4, iters = 2, threshold = tau)
    assert(kept2.filter(col("vec_id") === 999999L).isEmpty,
      "an exact duplicate embedding must be dropped")
  }
}
