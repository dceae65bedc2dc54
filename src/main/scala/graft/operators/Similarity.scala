package graft.operators

import graft.functions.ScaledCosineFunctions.scaledCosine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Scaled-integer inner products: components are rounded to 6 decimals and
  * multiplied as longs, so scores are exact, order-independent, and
  * reproducible across engines (the same trick as QueryDsl's money sums —
  * a 64-dim dot of ±1e6-scaled values fits comfortably in a long).
  *
  * Scale path: brute force is one broadcast of the query vector and a
  * map-side top-k (TakeOrderedAndProject); the LSH variant buckets vectors
  * by random-hyperplane signature so each probe touches a small bucket —
  * at 100 TB the bucketed table is pre-partitioned by signature and the
  * probe is a bucket-local scan instead of a full pass.
  */
object Similarity {

  /** embedding (array<float>) → array<long> scaled 1e6 */
  def scaled(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000000d, 0).cast("long"))

  /** exact scaled dot product (long) */
  def dotScaled(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** cosine from scaled vectors, deterministic double tree */
  def cosineScaled(a: Column, b: Column): Column =
    dotScaled(a, b).cast("double") /
      (sqrt(dotScaled(a, a).cast("double")) *
        sqrt(dotScaled(b, b).cast("double")))

  /** Brute-force top-k cosine neighbors of one query vector (driver-
    * provided), excluding the query id itself. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int): DataFrame = {
    val qLit = typedLit(queryVec.toSeq)
    df.select(col(idCol).as("vec_id"),
      scaledCosine(col(vecCol), qLit).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Random-hyperplane LSH signature: `bits` sign-bits of dots with
    * pseudo-random planes derived deterministically from (bit, dim) hashes —
    * no RNG state to ship, identical on every executor. */
  def lshSignature(vecCol: Column, bits: Int): Column = {
    val planes = transform(sequence(lit(0), lit(bits - 1)), bit =>
      struct(bit.as("bit"),
        aggregate(
          zip_with(vecCol,
            sequence(lit(0), size(vecCol) - 1),
            (x, i) => x.cast("double") *
              // hash-derived plane component in [-1, 1)
              (pmod(hash(bit, i), lit(20001)) - 10000).cast("double") / 1e4),
          lit(0d), (acc, x) => acc + x).as("dot")))
    aggregate(planes, lit(0L), (acc, p) =>
      acc.bitwiseOR(when(p.getField("dot") > 0,
        call_function("shiftleft", lit(1L), p.getField("bit")))
        .otherwise(0L)))
  }

  /** ANN via LSH buckets: probe returns top-k within the query's bucket
    * (and hamming≤1 neighbor buckets for recall). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, bits: Int = 12): DataFrame = {
    val withSig = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), bits).as("sig"))
    val qDf = df.sparkSession.range(1)
      .select(lshSignature(typedLit(queryVec.toSeq), bits).as("qsig"))
    val qSig = qDf.head().getLong(0)
    // query bucket + all hamming-1 buckets
    val probes = qSig +: (0 until bits).map(b => qSig ^ (1L << b))
    val qLit = typedLit(queryVec.toSeq)
    withSig.filter(col("sig").isin(probes: _*))
      .select(col("vec_id"),
        scaledCosine(col("v"), qLit).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path: vectors
    * are assigned to their nearest of `nlist` centroids ONCE (at 100 TB
    * this is a materialized index column, recomputed only on reindex) and
    * a probe scans the `nprobe` clusters nearest the query instead of the
    * full table. Centroids are deterministic: the lexicographically first
    * `nlist` ids seed them, refined by one Lloyd iteration as a single
    * groupBy-avg pass.
    *
    * Returns the top-k within the probed clusters. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, nlist: Int = 16,
      nprobe: Int = 4, iters: Int = 1,
      trainModulus: Int = 1): DataFrame = {
    val (cents, assigned) = ivfIndex(df, idCol, vecCol, nlist, iters,
      trainModulus)
    ivfProbe(cents, assigned, queryVec, k, nprobe)
  }

  /** Build the IVF index: deterministic centroids (first `nlist` ids as
    * seeds, refined by `iters` Lloyd passes, each a single groupBy-avg) +
    * the per-vector cluster assignment as a COLUMN `c`. This is the
    * one-time (reindex) cost; probes never recompute it.
    *
    * `trainModulus` > 1 trains the quantizer on the deterministic sample
    * `vec_id % trainModulus == 0` — the 100 TB pattern: Lloyd passes scan
    * only the sample, and the full table is touched exactly once for the
    * final assignment. Centroid quality needs only a representative
    * sample, not the corpus. */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, iters: Int = 1,
      trainModulus: Int = 1): (Array[Array[Float]], DataFrame) = {
    val base = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val train =
      if (trainModulus > 1) base.filter(col("vec_id") % trainModulus === 0)
      else base

    // deterministic seeds: first nlist vectors by id
    val seeds = train.orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id"), col("v")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    def nearestIdx(cents: Array[Array[Float]])(vec: Column): Column = {
      val scored = cents.zipWithIndex.map { case (c, i) =>
        struct(scaledCosine(vec, typedLit(c.toSeq)).as("s"),
          lit(i).as("i"))
      }
      // argmax cosine = nearest centroid
      aggregate(array(scored: _*),
        struct(lit(-2d).as("s"), lit(-1).as("i")),
        (acc, x) => when(x.getField("s") > acc.getField("s"), x)
          .otherwise(acc)).getField("i")
    }

    // Lloyd refinement: mean of assigned vectors per cluster; empty
    // clusters keep their previous centroid. Centroids are tiny (nlist ×
    // dim floats), so per-iteration state lives on the driver and each
    // pass is one shuffle-light aggregation over the training sample.
    val dim = seeds.head.length
    var cents = seeds
    for (_ <- 0 until math.max(iters, 0)) {
      val refined = train
        .groupBy(nearestIdx(cents)(col("v")).as("c"))
        .agg(array((0 until dim).map(d =>
          avg(element_at(col("v"), d + 1).cast("double")).cast("float")): _*)
          .as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      cents = seeds.indices.map(i => refined.getOrElse(i, cents(i))).toArray
    }
    (cents, base.withColumn("c", nearestIdx(cents)(col("v"))))
  }

  /** Probe an IVF index: pick the `nprobe` clusters nearest the query
    * driver-side (centroids are tiny) and brute-force only within them. */
  def ivfProbe(cents: Array[Array[Float]], assigned: DataFrame,
      queryVec: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    val qScores = cents.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(queryVec).map { case (a, b) => a.toDouble * b }.sum
      val na = math.sqrt(c.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(queryVec.map(x => x.toDouble * x).sum)
      (i, dot / (na * nb))
    }
    val probeIds = qScores.sortBy(-_._2).take(nprobe).map(_._1)
    val qLit = typedLit(queryVec.toSeq)
    assigned
      .filter(col("c").isin(probeIds.toIndexedSeq: _*))
      .select(col("vec_id"),
        scaledCosine(col("v"), qLit).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** PERSIST the IVF index (`reindex` maintenance op): vectors+assignment
    * land partitioned BY cluster, centroids beside them — so a probe is a
    * partition-pruned scan of `nprobe` directories, not a full pass.
    * This is the 100 TB path: reindex amortizes over every probe. */
  def ivfReindex(df: DataFrame, idCol: String, vecCol: String,
      indexPath: String, nlist: Int = 16, iters: Int = 1,
      trainModulus: Int = 1): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val (cents, assigned) = ivfIndex(df, idCol, vecCol, nlist, iters,
      trainModulus)
    assigned.write.mode("overwrite").partitionBy("c")
      .parquet(s"$indexPath/vectors")
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("i", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/centroids")
  }

  /** PERSIST the LSH index: (vec_id, vector, signature) partitioned BY
    * signature bucket, bit-width stored beside it — the same reindex-once
    * contract as [[ivfReindex]]. A probe is a partition-pruned scan of
    * the query bucket + its hamming-1 neighbors (bits+1 directories), not
    * a full-table signature recompute. */
  def lshReindex(df: DataFrame, idCol: String, vecCol: String,
      indexPath: String, bits: Int = 12): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), bits).as("sig"))
      .write.mode("overwrite").partitionBy("sig")
      .parquet(s"$indexPath/vectors")
    Seq(bits).toDF("bits").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** Probe a persisted LSH index (partition pruning on `sig`). */
  def lshProbeIndexed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queryVec: Array[Float], k: Int): DataFrame = {
    val bits = spark.read.parquet(s"$indexPath/meta").head().getInt(0)
    val qSig = spark.range(1)
      .select(lshSignature(typedLit(queryVec.toSeq), bits).as("qsig"))
      .head().getLong(0)
    val probes = qSig +: (0 until bits).map(b => qSig ^ (1L << b))
    val qLit = typedLit(queryVec.toSeq)
    spark.read.parquet(s"$indexPath/vectors")
      .filter(col("sig").isin(probes: _*))
      .select(col("vec_id"),
        scaledCosine(col("v"), qLit).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Probe a persisted IVF index: reads centroids (tiny), then scans ONLY
    * the probed cluster partitions (partition pruning on `c`). */
  def ivfProbeIndexed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queryVec: Array[Float], k: Int,
      nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .orderBy(col("i")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    ivfProbe(cents, spark.read.parquet(s"$indexPath/vectors"),
      queryVec, k, nprobe)
  }

  /** Guard for the brute-force pair refinement: it is quadratic BY
    * DESIGN (the refine primitive over a candidate block), so reject
    * inputs that are clearly not a block — at 100 TB an unblocked call
    * would be a planetary cross join. Raise only if you know better. */
  val NearDupPairsMaxRows: Long = 200000L

  /** All pairs with cosine ≥ threshold (brute force n²; used on candidate
    * blocks — callers block first at scale, see [[nearDupPairsBlocked]],
    * which returns identical output without the n² plan). Inputs larger
    * than [[NearDupPairsMaxRows]] are rejected — call the blocked
    * variant instead. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val n = df.limit((NearDupPairsMaxRows + 1).toInt).count()
    require(n <= NearDupPairsMaxRows,
      s"nearDupPairs is the quadratic refine primitive (> " +
        s"$NearDupPairsMaxRows rows supplied); use nearDupPairsBlocked " +
        "for full-corpus near-dup detection")
    val s = df.select(col(idCol).as("id"), scaled(col(vecCol)).as("sv"))
    val a = s.select(col("id").as("id_a"), col("sv").as("sv_a"))
    val b = s.select(col("id").as("id_b"), col("sv").as("sv_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("score", cosineScaled(col("sv_a"), col("sv_b")))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** All pairs with cosine ≥ threshold, EXACT but blocked — no n² cross
    * product in the plan. Vectors take the IVF coarse assignment (at
    * 100 TB this is the persisted index column, not a recompute); the
    * spherical triangle inequality
    * `angle(a,b) ≥ angle(c_a,c_b) − r_a − r_b` (r = cluster radius, the
    * max member-to-centroid angle) prunes every cluster pair that cannot
    * reach `arccos(threshold)` WITHOUT touching its members. Surviving
    * cluster pairs become an equi-join on the cluster key — co-located,
    * shuffle carries only candidate blocks — and the exact scaled cosine
    * refines, so the output is identical to [[nearDupPairs]]. Clustered
    * embeddings (real corpora) prune most of the nlist² grid; worst-case
    * uniform data degrades to the brute-force pair count but never loses
    * a pair. */
  def nearDupPairsBlocked(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16): DataFrame = {
    val (cents, assigned) = ivfIndex(df, idCol, vecCol, nlist)
    // raw double cosine to the OWN centroid, per row: element_at over the
    // per-centroid cosine array, then max angle per cluster = its radius
    val cosToOwn = element_at(
      array(cents.map(c => cosineRaw(col("v"), typedLit(c.toSeq))): _*),
      col("c") + 1)
    val radii = assigned
      .groupBy(col("c"))
      .agg(max(acos(least(lit(1d), greatest(lit(-1d), cosToOwn))))
        .as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val pairs = clusterCandidates(cents, radii, threshold)
    val spark = df.sparkSession
    import spark.implicits._
    val cand = broadcast(pairs.toDF("ci", "cj"))
    val a = assigned.select(col("vec_id").as("id_a"),
      scaled(col("v")).as("sv_a"), col("c").as("ca"))
    val b = assigned.select(col("vec_id").as("id_b"),
      scaled(col("v")).as("sv_b"), col("c").as("cb"))
    a.join(cand, col("ca") === col("ci"))
      .join(b, col("cb") === col("cj"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", cosineScaled(col("sv_a"), col("sv_b")))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** Cluster pairs that MAY contain a qualifying pair (both directions for
    * i≠j so the id_a<id_b filter never drops a cross-cluster pair). The
    * 1e-3 rad slack absorbs the gap between the double-precision bound
    * math and the scaled-integer refine cosine. */
  private[graft] def clusterCandidates(cents: Array[Array[Float]],
      radii: Map[Int, Double], threshold: Double): Seq[(Int, Int)] = {
    val maxAngle = math.acos(math.min(1d, math.max(-1d, threshold))) + 1e-3
    def angle(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      math.acos(math.min(1d, math.max(-1d, dot / (na * nb))))
    }
    for {
      i <- cents.indices
      j <- cents.indices
      // clusters that never got a member have no radius — nothing to join
      ri <- radii.get(i).toSeq
      rj <- radii.get(j).toSeq
      if angle(cents(i), cents(j)) <= maxAngle + ri + rj
    } yield (i, j)
  }

  /** plain double cosine (bounds only — refine uses [[cosineScaled]]) */
  private def cosineRaw(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** round-half-away-from-zero integer division (the centroid mean) —
    * the exact formula the DuckDB oracle spells with `//`, so both
    * engines derive bit-identical centroids every round */
  @inline private def rdiv(s: Long, n: Long): Long =
    if (s >= 0) (2 * s + n) / (2 * n) else -((-2 * s + n) / (2 * n))

  /** Distributed k-means (Lloyd's) over an embedding column, fully
    * deterministic and engine-reproducible: vectors are 1e6-scaled longs
    * ([[scaled]]), centroids are integer component-wise means (round half
    * away from zero), assignment is argmin squared-L2 in pure long
    * arithmetic with ties to the smaller cluster id
    * ([[graft.functions.NearestCentroid]] — one fused codegen loop, no
    * k×N candidate join), and the init is the k smallest-id vectors. A
    * DuckDB oracle can replay every round as unrolled CTEs and match the
    * final assignment hash-exactly.
    *
    * Scale shape: each round is one map-side-combinable aggregation —
    * posexplode fans a row into `dim` (cluster, idx, val) entries but
    * partial aggregation collapses them to k·dim rows PER PARTITION
    * before the shuffle, and only k·dim aggregated rows reach the driver
    * (centroids are metadata, like IVF's). Empty clusters keep their
    * previous centroid. Returns (vec_id, cluster). */
  def kMeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 3): DataFrame =
    kMeansModel(df, idCol, vecCol, k, iters)._2

  /** [[kMeans]] plus the final integer centroids (k·dim longs — model
    * metadata, like the IVF quantizer). */
  def kMeansModel(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 3): (Array[Array[Long]], DataFrame) = {
    // keep the FLOAT vectors: NearestCentroid scales inside its fused
    // loop, and pre-scaling via transform() (a non-codegen HOF) would
    // push every assignment projection out of WholeStageCodegen
    val s = df.select(col(idCol).as("vec_id"), col(vecCol).as("fv"))
      .persist()
    var centroids: Array[Array[Long]] = s.orderBy(col("vec_id")).limit(k)
      .select(col("fv")).collect()
      .map(_.getSeq[Float](0).toArray
        .map(graft.functions.ScaledCosineOps.sc))
    require(centroids.length == k,
      s"k-means needs at least $k vectors, found ${centroids.length}")
    for (_ <- 1 to iters) {
      val assigned = s.withColumn("c",
        graft.functions.NearestCentroidFunctions
          .nearestCentroid(col("fv"), centroids))
      val sums = assigned
        .select(col("c"), posexplode(col("fv")).as(Seq("idx", "v")))
        // per-element scaling AFTER the explode is a plain scalar
        // expression (codegen), identical to scaled()'s rounding
        .groupBy(col("c"), col("idx"))
        .agg(sum(round(col("v").cast("double") * 1000000d, 0)
          .cast("long")).as("sv"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        byCluster.get(j) match {
          case Some(rows) =>
            val c = old.clone()
            rows.foreach(r => c(r.getInt(1)) = rdiv(r.getLong(2), r.getLong(3)))
            c
          case None => old // empty cluster: centroid carries over
        }
      }
    }
    val out = s.select(col("vec_id"),
      graft.functions.NearestCentroidFunctions
        .nearestCentroid(col("fv"), centroids).as("cluster"))
    s.unpersist()
    (centroids, out)
  }

  /** Cluster representatives (diversity sampling): the member nearest its
    * cluster's final centroid — integer distance, ties to the smaller
    * vec_id — one per cluster. The window partitions by cluster id (k
    * partitions; k is a model knob, so skew is bounded by design), and
    * the distance is computed against the broadcast centroid literal —
    * no second pass over the model fit. */
  def clusterMedoids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): DataFrame = {
    val (cents, assigned) = kMeansModel(df, idCol, vecCol, k, iters)
    val s = df.select(col(idCol).as("vec_id"), col(vecCol).as("fv"))
      .join(assigned, "vec_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("d"), col("vec_id"))
    // fused codegen distance to the row's own centroid — the full-corpus
    // medoid pass stays map-only + one k-bounded window
    s.withColumn("d", graft.functions.NearestCentroidFunctions
        .centroidDistance(col("fv"), col("cluster"), cents))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("vec_id"))
  }

  /** Product-quantization encode: split the embedding into `m` equal
    * subspaces, fit a deterministic [[kMeansModel]] codebook per
    * subspace, and emit each vector's per-subspace nearest-centroid code
    * — the standard 64× compression step for billion-vector ANN (codes
    * are m small ints instead of dim floats). Training is m bounded
    * k-means fits (codebooks are model metadata); encoding is ONE
    * map-only projection with m fused codegen argmins over array slices
    * — no join, no shuffle, so the encode pass streams at scan speed
    * over any corpus size. Same integer arithmetic as [[kMeans]], so a
    * DuckDB oracle replays all m chains and matches the codes exactly.
    * Returns (vec_id, code0 … code{m-1}). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, k: Int = 8, iters: Int = 2): DataFrame =
    pqModel(df, idCol, vecCol, m, k, iters)._2

  /** [[pqEncode]] plus the per-subspace codebooks (m·k·subDim longs —
    * model metadata). */
  def pqModel(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, k: Int = 8, iters: Int = 2)
      : (Seq[Array[Array[Long]]], DataFrame) = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val codebooks = (0 until m).map { j =>
      kMeansModel(df.select(col(idCol),
        slice(col(vecCol), j * sub + 1, sub).as("emb")),
        idCol, "emb", k, iters)._1
    }
    val s = df.select(col(idCol).as("vec_id"), col(vecCol).as("fv"))
    val codes = s.select(col("vec_id") +: (0 until m).map(j =>
      graft.functions.NearestCentroidFunctions.nearestCentroid(
        slice(col("fv"), j * sub + 1, sub), codebooks(j))
        .cast("long").as(s"code$j")): _*)
    (codebooks, codes)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query is scaled
    * and sliced once on the driver, a k-entry squared-distance lookup
    * table per subspace is precomputed against the FINAL codebooks, and
    * each encoded vector's approximate distance is m literal-array
    * lookups + a sum — a map-only scoring pass feeding
    * TakeOrderedAndProject, the plan shape that scans compressed codes
    * instead of raw floats at 100 TB (the whole point of PQ). Integer
    * distances → deterministic, oracle-exact ranking (ties to the
    * smaller vec_id). */
  def pqAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], topK: Int,
      m: Int = 4, k: Int = 8, iters: Int = 2): DataFrame = {
    val (codebooks, codes) = pqModel(df, idCol, vecCol, m, k, iters)
    val sub = queryVec.length / m
    val sq = queryVec.map(graft.functions.ScaledCosineOps.sc)
    val luts: Seq[Seq[Long]] = (0 until m).map { j =>
      codebooks(j).toSeq.map { cent =>
        var d = 0L
        var i = 0
        while (i < sub) {
          val x = sq(j * sub + i) - cent(i)
          d += x * x
          i += 1
        }
        d
      }
    }
    val dist = (0 until m).map(j =>
      element_at(typedLit(luts(j)), (col(s"code$j") + 1).cast("int")))
      .reduce(_ + _)
    codes.withColumn("adist", dist)
      .orderBy(col("adist"), col("vec_id"))
      .limit(topK)
      .select(col("vec_id"), col("adist"))
  }

  /** IVF-PQ probe (the faiss IVFPQ layout with `by_residual=false`):
    * the corpus is coarse-partitioned by [[kMeans]] cluster, vectors are
    * stored as PQ codes, and a query probes only the `nprobe` coarse
    * cells nearest it — ADC-scoring codes instead of floats. At 100 TB
    * the coarse cell is the partition key of the persisted index (like
    * [[ivfReindex]]) and a probe reads nprobe partitions of 4-long codes
    * — both the IO reduction (partition pruning) and the CPU reduction
    * (ADC) compose. All arithmetic is the same scaled-long machinery, so
    * the approximate result is deterministic and oracle-exact. Ties
    * break to the smaller coarse cell / vec_id. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], topK: Int, kCoarse: Int = 8,
      coarseIters: Int = 2, m: Int = 4, k: Int = 8, iters: Int = 2,
      nprobe: Int = 3): DataFrame = {
    val (coarseCents, coarseAssign) =
      kMeansModel(df, idCol, vecCol, kCoarse, coarseIters)
    val sq = queryVec.map(graft.functions.ScaledCosineOps.sc)
    def distToCent(c: Array[Long]): Long = {
      var d = 0L
      var i = 0
      while (i < c.length) { val x = sq(i) - c(i); d += x * x; i += 1 }
      d
    }
    val probed = coarseCents.zipWithIndex
      .map { case (c, j) => (distToCent(c), j) }
      .sorted.take(nprobe).map(_._2)
    val (codebooks, codes) = pqModel(df, idCol, vecCol, m, k, iters)
    val sub = queryVec.length / m
    val luts: Seq[Seq[Long]] = (0 until m).map { j =>
      codebooks(j).toSeq.map { cent =>
        var d = 0L
        var i = 0
        while (i < sub) {
          val x = sq(j * sub + i) - cent(i)
          d += x * x
          i += 1
        }
        d
      }
    }
    val dist = (0 until m).map(j =>
      element_at(typedLit(luts(j)), (col(s"code$j") + 1).cast("int")))
      .reduce(_ + _)
    coarseAssign.filter(col("cluster").isin(probed.toSeq: _*))
      .join(codes, "vec_id")
      .withColumn("adist", dist)
      .orderBy(col("adist"), col("vec_id"))
      .limit(topK)
      .select(col("vec_id"), col("adist"))
  }

  /** SemDeDup-style semantic dedup: cluster with [[kMeans]], then inside
    * each cluster drop any vector that has a smaller-id neighbor with
    * cosine above `threshold`. Deterministic single-pass variant of the
    * greedy SemDeDup sweep (a dropped vector can still shadow later ids —
    * strictly more aggressive, and expressible as one equi-join).
    * Pairwise work is cluster-blocked: the join key is the cluster id, so
    * the plan carries no cross product and at 100 TB the pair volume is
    * bounded by the largest cluster (pick k accordingly — the same knob
    * SemDeDup itself exposes). Returns the KEPT rows (vec_id, cluster). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3, threshold: Double = 0.95): DataFrame = {
    val assigned = kMeans(df, idCol, vecCol, k, iters)
    val s = df.select(col(idCol).as("vec_id"), col(vecCol).as("fv"))
      .join(assigned, "vec_id")
    val a = s.select(col("cluster"), col("vec_id").as("id_a"),
      col("fv").as("fv_a"))
    val b = s.select(col("cluster"), col("vec_id").as("id_b"),
      col("fv").as("fv_b"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      // fused scaled cosine over the float arrays (same semantics as
      // cosineScaled∘scaled, but stays inside whole-stage codegen)
      .filter(scaledCosine(col("fv_a"), col("fv_b")) > threshold)
      .select(col("id_b").as("vec_id")).distinct()
    s.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
  }
}
