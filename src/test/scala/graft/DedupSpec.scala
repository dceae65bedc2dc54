package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall checks for the non-SQL-expressible near-dup operators: planted
  * near-duplicates must be found; exact results cross-checked against
  * brute force. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables(spark, dir).documents
    .select("doc_id", "text")

  private lazy val planted = {
    val mutated = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" zz_mutation")).as("text"))
    docs.unionByName(mutated)
  }

  test("minhash LSH recalls planted near-dups") {
    val nDocs = docs.count()
    val dups = Dedup.minhashDuplicates(planted, "doc_id", "text",
      threshold = 0.7)
    val found = dups
      .filter(col("id_b") === col("id_a") + 1000000L).count()
    // banded LSH with b=16,r=4 at J≈0.9+: expected recall ≈ 1
    assert(found >= (nDocs * 0.95).toLong,
      s"recall too low: $found of $nDocs")
    // no false positives below threshold (verification stage is exact)
    val verified = dups.agg(min(col("jaccard"))).head().getDouble(0)
    assert(verified >= 0.7)
  }

  test("simhash recalls planted near-dups") {
    val nDocs = docs.count()
    val dups = Dedup.simhashDuplicates(planted, "doc_id", "text",
      maxDistance = 6)
    val found = dups
      .filter(col("id_b") === col("id_a") + 1000000L).count()
    assert(found >= (nDocs * 0.8).toLong,
      s"recall too low: $found of $nDocs")
  }

  test("exact dedup keeps one row per content") {
    // EXACT copies (ids shifted, same text) — unlike `planted`, whose
    // mutated texts are only near-dups
    val copies = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"))
    val out = Dedup.exact(docs.unionByName(copies), "doc_id", "text")
    assert(out.count() == docs.count())
    assert(out.agg(max(col("dup_count"))).head().getLong(0) == 2L)
  }

  test("LSH ANN finds planted copies of the query vector") {
    val e = Tables(spark, dir).embeddings
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    // identical vectors share the signature → always probed; cosine 1.0
    // puts them at the top of the bucket-local ranking
    val copies = e.filter(col("vec_id") === 0)
      .select(explode(sequence(lit(100001L), lit(100010L))).as("vec_id"),
        col("embedding"))
    val corpus = e.filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding").unionByName(copies)
    val lsh = Similarity.lshTopK(corpus, "vec_id", "embedding", qv, 10)
      .collect().map(r => r.getLong(0)).toSet
    assert((100001L to 100010L).forall(lsh.contains),
      s"planted copies missing from ANN result: $lsh")
  }

  test("IVF ANN recalls planted copies and agrees with brute force") {
    val e = Tables(spark, dir).embeddings
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val copies = e.filter(col("vec_id") === 0)
      .select(explode(sequence(lit(100001L), lit(100010L))).as("vec_id"),
        col("embedding"))
    val corpus = e.filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding").unionByName(copies)
    // identical vectors land in the query's own cluster → always probed
    val ivf = Similarity.ivfTopK(corpus, "vec_id", "embedding", qv, 10)
      .collect().map(r => r.getLong(0)).toSet
    assert((100001L to 100010L).forall(ivf.contains),
      s"planted copies missing from IVF result: $ivf")
    // broad probe ≈ brute force: with all clusters probed, results match
    val all = Similarity.ivfTopK(corpus, "vec_id", "embedding", qv, 20,
      nlist = 8, nprobe = 8).collect().map(r => r.getLong(0)).toSeq
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qv, 20)
      .collect().map(r => r.getLong(0)).toSeq
    assert(all == bf)
  }

  test("multi-iteration Lloyd on a training sample keeps recall, deterministically") {
    val e = Tables(spark, dir).embeddings
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val copies = e.filter(col("vec_id") === 0)
      .select(explode(sequence(lit(100001L), lit(100010L))).as("vec_id"),
        col("embedding"))
    val corpus = e.filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding").unionByName(copies)
    def run() = Similarity.ivfTopK(corpus, "vec_id", "embedding", qv, 10,
      nlist = 8, nprobe = 3, iters = 3, trainModulus = 3)
      .collect().map(_.getLong(0)).toSeq
    val a = run()
    assert((100001L to 100010L).forall(a.contains),
      s"planted copies missing after sampled multi-iter training: $a")
    assert(a == run(), "index build must be deterministic")
  }

  test("persisted IVF index: probe scans only probed cluster partitions") {
    val e = Tables(spark, dir).embeddings
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val corpus = e.select("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graftivf").toString
    // reindex once: assignment materialized, vectors partitioned by c
    Similarity.ivfReindex(corpus, "vec_id", "embedding", idx, nlist = 8)
    val probe = Similarity.ivfProbeIndexed(spark, idx, qv, 10, nprobe = 2)
    // identical results to the unindexed path (same centroids/assignment)
    val direct = Similarity.ivfTopK(corpus, "vec_id", "embedding", qv, 10,
      nlist = 8, nprobe = 2).collect().map(r => r.getLong(0)).toSeq
    assert(probe.collect().map(r => r.getLong(0)).toSeq == direct)
    // plan shape: partition pruning on c — a probe reads only the probed
    // cluster directories, not the whole index
    val scans = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"),
      s"probe must prune on the cluster partition column:\n$planStr")
    val totalFiles = scans.flatMap(_.relation.location.inputFiles)
      .count(_.contains("c="))
    val readFiles = scans.map(_.metrics("numFiles").value).sum
    assert(readFiles > 0 && readFiles < totalFiles,
      s"probe read $readFiles of $totalFiles files — pruning missing")
  }

  test("persisted LSH index: probe prunes to query+neighbor buckets") {
    val e = Tables(spark, dir).embeddings
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val corpus = e.select("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graftlsh").toString
    Similarity.lshReindex(corpus, "vec_id", "embedding", idx, bits = 8)
    val probe = Similarity.lshProbeIndexed(spark, idx, qv, 10)
    // identical to the unindexed path (same deterministic signatures)
    val direct = Similarity.lshTopK(corpus, "vec_id", "embedding", qv, 10,
      bits = 8).collect().map(r => r.getLong(0)).toSeq
    assert(probe.collect().map(r => r.getLong(0)).toSeq == direct)
    // partition pruning on sig: bits+1 probed buckets of up to 2^8
    val scans = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val totalFiles = scans.flatMap(_.relation.location.inputFiles)
      .count(_.contains("sig="))
    val readFiles = scans.map(_.metrics("numFiles").value).sum
    assert(readFiles > 0 && readFiles < totalFiles,
      s"probe read $readFiles of $totalFiles bucket files — pruning missing")
  }

  test("planted identical embeddings found by near-dup pairs") {
    val e = Tables(spark, dir).embeddings.select("vec_id", "embedding")
    val dup = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val pairs = Similarity.nearDupPairs(e.unionByName(dup), "vec_id",
      "embedding", threshold = 0.99)
    assert(pairs.count() == 10)
  }

  test("blocked near-dup pairs equal brute force, with no cross product") {
    val e = Tables(spark, dir).embeddings.select("vec_id", "embedding")
    val dup = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val all = e.unionByName(dup)
    val brute = Similarity.nearDupPairs(all, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.nearDupPairsBlocked(
      all, "vec_id", "embedding", 0.99)
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"blocked near-dup plan still contains a cross product:\n$plan")
    val got = blocked.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"blocked=${got.size} brute=${brute.size}")
  }

  test("connected components: chains, isolated nodes, multiple clusters") {
    // one 10-node chain (diameter forces several propagation rounds),
    // one triangle, one isolated node
    val edges = ((0L to 8L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L))).toDF("id_a", "id_b")
    val nodes = ((0L to 9L) ++ Seq(100L, 101L, 102L, 999L)).toDF("id")
    val comp = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 9L).forall(comp(_) == 0L), s"chain labels: $comp")
    assert(Seq(100L, 101L, 102L).forall(comp(_) == 100L))
    assert(comp(999L) == 999L)
  }

  test("connected components fail loudly when the round budget is hit") {
    // a 10-node chain needs more than 2 min-label rounds; silent exit
    // would hand back wrong labels
    val edges = (0L to 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 9L).toDF("id")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, edges, maxIter = 2).collect()
    }
  }

  test("exact-substring coverage flags byte-identical twins fully") {
    // a doc duplicated verbatim has EVERY 8-gram shared → dup_grams ==
    // n_grams and the ≥10% flag fires; unrelated long docs stay clean
    import graft.operators.PipelineQueries
    val q = PipelineQueries.queries.find(_.name == "dedup_substring").get
    val out = q.fn(spark, dir)
    val planted = out.filter(col("doc_id") < 50) // generator plants dups
    assert(out.count() > 0)
    assert(out.filter(col("dup_grams") > col("n_grams")).count() == 0)
    // flag is exactly the 10% rule — recompute and compare
    val bad = out.filter(
      (col("dup_grams") * 10 >= col("n_grams")).cast("long") =!=
        col("flagged")).count()
    assert(bad == 0)
    assert(planted.count() > 0)
  }

  test("dsir weights rank in-domain docs above out-of-domain") {
    // scoring against target source='src0' must rank src0 docs higher on
    // average than the corpus tail: the top-100 should over-represent src0
    import graft.operators.PipelineQueries
    val q = PipelineQueries.queries.find(_.name == "dsir_weight").get
    val top = q.fn(spark, dir)
    val docs0 = Tables(spark, dir).documents.select("doc_id", "source")
    val joined = top.join(docs0, "doc_id")
    val frac0 = joined.filter(col("source") === "src0").count().toDouble /
      joined.count()
    val base = docs0.filter(col("source") === "src0").count().toDouble /
      docs0.count()
    assert(frac0 >= base,
      s"top-100 src0 fraction $frac0 below corpus baseline $base")
  }

  test("centroid-angle bound prunes far cluster pairs, keeps near ones") {
    // orthogonal centroids with tight radii: cross pairs cannot reach
    // cos 0.9 (angle π/2 > 0.451 + 0.05 + 0.05) and must be pruned
    def axis(i: Int): Array[Float] = {
      val v = Array.fill(8)(0f); v(i) = 1f; v
    }
    val cents = Array(axis(0), axis(4))
    val radii = Map(0 -> 0.05, 1 -> 0.05)
    val cand = Similarity.clusterCandidates(cents, radii, threshold = 0.9)
    assert(cand.toSet == Set((0, 0), (1, 1)), s"candidates: $cand")
    // widen the radii until the bound can no longer exclude the cross pair
    val wide = Similarity.clusterCandidates(cents,
      Map(0 -> 0.6, 1 -> 0.6), threshold = 0.9)
    assert(wide.toSet.size == 4, s"wide-radius candidates: $wide")
  }
}
