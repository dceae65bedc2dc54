package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for large-scale text corpora — Spark-native
  * (explode/groupBy/join; no driver-side loops), designed so every stage is
  * a shuffle on a bounded key space:
  *
  *  - exact: hash-groupBy on content
  *  - MinHash+LSH: shingle → k seeded min-hashes → b bands → bucket join;
  *    candidate pairs verified with exact Jaccard
  *  - SimHash: 64-bit sign-aggregated token hashes; near-dup = low Hamming
  *    distance within LSH blocks on 16-bit chunks
  *
  * At 100 TB: shingling explodes ~|tokens| rows per doc, the minhash
  * aggregation is a map-side-combinable min per (doc, seed), and band
  * bucketing shuffles only (band, signature) keys; candidate verification
  * touches only colliding pairs. Skewed buckets (boilerplate docs) are
  * capped via `maxBucketSize`.
  */
object Dedup {

  /** exact dedup: one keeper (min id) per identical content.
    *
    * Hash-first: the main shuffle carries (xxhash64(text), id) — 16
    * bytes/row instead of full document bodies. Only hash-COLLIDING
    * groups (a vanishing fraction) re-shuffle their text for exact
    * verification, so different texts sharing a hash still dedup
    * correctly without the whole corpus ever shuffling its content. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(xxhash64(col(textCol)).as("__h"),
      col(idCol).as("__id"))
    val groups = hashed.groupBy(col("__h"))
      .agg(min(col("__id")).as("keeper"), count(lit(1)).as("dup_count"))
    val collided = groups.filter(col("dup_count") > 1).select(col("__h"))
    val singles = groups.filter(col("dup_count") === 1)
      .select(col("keeper"), col("dup_count"))
    // hash groups with >1 member: verify on the actual content (exact
    // groupBy on text, but only over the collided slice of the corpus)
    val verified = df
      .select(xxhash64(col(textCol)).as("__h"), col(idCol).as("__id"),
        col(textCol).as("__t"))
      .join(collided, Seq("__h"), "left_semi")
      .groupBy(col("__t"))
      .agg(min(col("__id")).as("keeper"), count(lit(1)).as("dup_count"))
      .select(col("keeper"), col("dup_count"))
    singles.unionByName(verified)
  }

  /** distinct word w-shingles as an array column */
  def shingles(textCol: Column, w: Int): Column = {
    val toks = split(textCol, " ")
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - w, lit(0))),
          i => when(i + w <= size(toks),
            concat_ws(" ", slice(toks, i + 1, lit(w))))),
        x => x.isNotNull))
  }

  /** Exact near-dup pairs of a DELTA batch against an indexed corpus —
    * the incremental form of n-gram Jaccard dedup: only pairs that share
    * at least one shingle meet (inverted-index equi-join on the shingle),
    * which is COMPLETE for any Jaccard threshold > 0, so the output
    * equals the all-pairs answer without ever forming delta × corpus.
    * Shuffles carry (id, shingle) pairs — the corpus TEXT never moves.
    * At 100 TB the shingle join's skew ceiling is stopword shingles;
    * capping document frequency would bound it but break exactness, so
    * operational runs compose this with [[minhashLshCandidates]] instead
    * when approximate recall is acceptable.
    * Returns (delta_id, corpus_id, jacc) at `threshold` or above. */
  def nearDupAgainst(index: DataFrame, delta: DataFrame, idCol: String,
      textCol: String, shingleWidth: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    def side(df: DataFrame, name: String): DataFrame =
      df.select(col(idCol).as(s"${name}_id"),
        shingles(col(textCol), shingleWidth).as("s"))
        .select(col(s"${name}_id"), size(col("s")).as(s"${name}_n"),
          explode(col("s")).as("sh"))
    side(delta, "delta").join(side(index, "corpus"), "sh")
      .groupBy(col("delta_id"), col("corpus_id"),
        col("delta_n"), col("corpus_n"))
      .agg(count(lit(1)).as("inter"))
      // threshold on the RAW ratio (like the all-pairs SQL oracle);
      // rounding is display-only — filtering the rounded value would
      // diverge at the boundary (0.4999997 rounds to 0.5)
      .withColumn("jacc_raw", col("inter") /
        (col("delta_n") + col("corpus_n") - col("inter")))
      .filter(col("jacc_raw") >= threshold)
      .select(col("delta_id"), col("corpus_id"),
        round(col("jacc_raw"), 6).as("jacc"))
  }

  /** MinHash signature matrix: (id, seed, minhash) using Spark's
    * codegen'd murmur3 `hash(seed, shingle)` as the seeded hash family. */
  private def minhashes(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleWidth: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), shingleWidth)).as("sh"))
      .select(col("id"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("seed"),
        col("sh"))
      .groupBy(col("id"), col("seed"))
      .agg(min(hash(col("seed"), col("sh"))).as("mh"))

  /** Candidate near-dup pairs via banded LSH over MinHash signatures.
    * numHashes = bands * rowsPerBand. Returns (id_a, id_b) with id_a<id_b. */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 16, rowsPerBand: Int = 4,
      shingleWidth: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = minhashes(df, idCol, textCol, numHashes, shingleWidth)
      .withColumn("band", col("seed") / rowsPerBand cast LongType)
    val bandSigs = sigs
      .groupBy(col("id"), col("band"))
      .agg(sort_array(collect_list(struct(col("seed"), col("mh"))))
        .as("sig"))
      .select(col("id"), col("band"), hash(col("band"), col("sig").cast("string"))
        .as("bucket"))
    // skew guard: drop pathological buckets (boilerplate collisions)
    val bounded = bandSigs
      .withColumn("bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))))
      .filter(col("bsz") <= maxBucketSize)
    val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** exact Jaccard over distinct shingle sets for given pairs */
  def verifyJaccard(df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, shingleWidth: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleWidth).as("sh"))
    pairs
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash LSH near-dup pairs, verified to `threshold` exact Jaccard. */
  def minhashDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, bands: Int = 16, rowsPerBand: Int = 4,
      shingleWidth: Int = 3): DataFrame = {
    val cands = minhashLshCandidates(df, idCol, textCol, bands, rowsPerBand,
      shingleWidth)
    verifyJaccard(df, idCol, textCol, cands, shingleWidth)
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from token hashes: per bit, sign of Σ(±1 weights). */
  def simhash(textCol: Column): Column = {
    val toks = split(textCol, " ")
    val hashes = transform(toks, t => xxhash64(t))
    // fold bits: for each of 64 bit positions count +1/-1; sign → bit
    val bitSums = transform(sequence(lit(0), lit(63)), bit =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(call_function("shiftright", h, bit).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, bit) => when(s > 0, call_function("shiftleft", lit(1L), bit)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on `numChunks` equal bit-slices of the
    * 64-bit signature (any chunk equal → candidate; by pigeonhole every
    * pair with Hamming < numChunks shares a chunk, so recall is GUARANTEED
    * for maxDistance ≤ numChunks-1), verify Hamming ≤ maxDistance.
    * More/smaller chunks widen the guarantee but grow buckets (a chunk key
    * space of 2^(64/numChunks)); 4×16-bit is the 100 TB default, 8×8-bit
    * trades bucket size for a Hamming-7 guarantee on smaller corpora. */
  def simhashDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 6, numChunks: Int = 4): DataFrame = {
    require(64 % numChunks == 0, "numChunks must divide 64")
    val chunkBits = 64 / numChunks
    val mask = (1L << chunkBits) - 1
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      explode(sequence(lit(0), lit(numChunks - 1))).as("chunk"))
      .withColumn("key",
        call_function("shiftright", col("sig"), col("chunk") * chunkBits)
          .bitwiseAND(lit(mask)))
    val a = chunked.select(col("chunk"), col("key"), col("id").as("id_a"),
      col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("key"), col("id").as("id_b"),
      col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sig_a"), col("sig_b")).as("distance"))
      .distinct()
      .filter(col("distance") <= maxDistance)
  }

  /** SimHash candidates refined with exact n-gram Jaccard — the standard
    * block-then-verify pipeline. Output is engine-portable: any pair the
    * blocking recalls is kept only if its EXACT Jaccard clears
    * `threshold`, so (whenever blocking recall is total, which the
    * pigeonhole guarantee gives for Hamming < numChunks) the result
    * equals the all-pairs Jaccard answer without an n² plan. */
  def simhashDuplicatesVerified(df: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.7, maxDistance: Int = 6,
      numChunks: Int = 4, shingleWidth: Int = 3): DataFrame = {
    val cands = simhashDuplicates(df, idCol, textCol, maxDistance, numChunks)
      .select(col("id_a"), col("id_b"))
    verifyJaccard(df, idCol, textCol, cands, shingleWidth)
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over near-dup edges → duplicate CLUSTERS: every
    * node gets the minimum id reachable from it (the cluster's canonical
    * keeper). Iterative min-label propagation — each round is one
    * shuffle join on node id plus a groupBy-min, converging in O(cluster
    * diameter) rounds; dedup clusters are shallow (pairwise-verified
    * edges), so a handful of rounds suffices at any corpus size. Each
    * round's labels are `localCheckpoint`ed — without lineage truncation
    * the logical plan references the previous round's plan twice, so plan
    * size (and planning/explain memory) doubles per round. On a real
    * cluster swap `localCheckpoint` for a reliable `checkpoint` dir to
    * survive executor loss.
    *
    * nodes: one column `id`; edges: `id_a`, `id_b`. Returns (id, cluster).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("id_a").as("id"), col("id_b").as("nbr"))
      .unionByName(edges.select(col("id_b").as("id"),
        col("id_a").as("nbr")))
      .persist()
    var labels = nodes.select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("nbr"), col("comp").as("nc")),
          "nbr")
        .groupBy("id").agg(min(col("nc")).as("min_nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("min_nbr"), col("comp")))
            .as("comp"))
        .localCheckpoint() // truncate lineage: keeps the per-round plan O(1)
      val changed = next.alias("n")
        .join(labels.alias("o"), Seq("id"))
        .filter(col("n.comp") =!= col("o.comp")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    // silent non-convergence would return wrong labels (a component wider
    // than maxIter rounds keeps >1 label) — fail loudly instead; callers
    // can raise maxIter, which only costs rounds actually used
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge after $maxIter rounds; " +
        "raise maxIter (components deeper than the round budget exist)")
    labels
  }
}
