package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly operators: duplicate-cluster resolution
  * (connected components over verified near-dup edges), deterministic
  * hash sampling, deterministic shard-shuffle, and token-budget packing.
  *
  * Everything is hash-deterministic (md5 over stable keys) rather than
  * RNG-seeded, so the same rows are selected on every engine and every
  * rerun — the property a reproducible training-data pipeline needs —
  * and each query has an exact DuckDB oracle.
  */
object TrainingPipeline extends QueryPack {

  private val shinglesSqlFrag =
    """list_distinct(list_transform(
      |    range(0, GREATEST(len(string_split(text,' ')) - 2, 0)),
      |    i -> array_to_string(string_split(text,' ')[i+1:i+3], ' ')))"""
      .stripMargin

  // ------------------------------------------------------ dedup clusters

  /** Duplicate clusters: planted mutation CHAINS (A→B→C, where only
    * consecutive pairs are candidate edges) force a real transitive
    * closure — pairwise verification alone cannot group A with C. The
    * Spark side runs distributed min-label propagation
    * ([[Dedup.connectedComponents]]); the oracle computes the same
    * closure with a recursive CTE. Output: one row per cluster keeper
    * with the member count. */
  private def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select("doc_id", "text")
    val b = d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" zz_mutation")).as("text"))
    val c = d.select((col("doc_id") + 2000000L).as("doc_id"),
      concat(col("text"), lit(" zz_mutation zz_more")).as("text"))
    val corpus = d.unionByName(b).unionByName(c)
    // candidate edges: only consecutive links of each planted chain
    val cand = d.select(col("doc_id").as("id_a"),
      (col("doc_id") + 1000000L).as("id_b"))
      .unionByName(d.select((col("doc_id") + 1000000L).as("id_a"),
        (col("doc_id") + 2000000L).as("id_b")))
    val edges = Dedup.verifyJaccard(corpus, "doc_id", "text", cand, 3)
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b")
    val nodes = corpus.select(col("doc_id").as("id"))
    Dedup.connectedComponents(nodes, edges)
      .groupBy(col("comp").as("cluster"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("cluster"))
  }

  private val dedupClustersSql =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text || ' zz_mutation' FROM documents
       |  UNION ALL SELECT doc_id + 2000000, text || ' zz_mutation zz_more' FROM documents),
       |sh AS (SELECT doc_id, $shinglesSqlFrag AS s FROM corpus),
       |cand AS (
       |  SELECT doc_id AS ia, doc_id + 1000000 AS ib FROM documents
       |  UNION ALL SELECT doc_id + 1000000, doc_id + 2000000 FROM documents),
       |edges AS (
       |  SELECT c.ia AS id_a, c.ib AS id_b FROM cand c
       |  JOIN sh a ON a.doc_id = c.ia JOIN sh b ON b.doc_id = c.ib
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |        CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5),
       |sym AS (SELECT id_a AS id, id_b AS nbr FROM edges
       |        UNION SELECT id_b, id_a FROM edges),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS m FROM corpus
       |  UNION
       |  SELECT s.id, r.m FROM sym s JOIN reach r ON r.id = s.nbr),
       |comp AS (SELECT id, MIN(m) AS cluster FROM reach GROUP BY id)
       |SELECT cluster, COUNT(*) AS n_members FROM comp
       |GROUP BY cluster ORDER BY cluster""".stripMargin

  /** Retention policy over duplicate clusters (the Dolma/RefinedWeb rule:
    * keep the BEST member of each near-dup cluster, not the first seen):
    * connected components label the clusters, an integer quality score
    * (distinct-token count — no floats, engine-exact) ranks members, and
    * one window pass keeps the argmax with doc_id as the deterministic
    * tiebreak. At scale: the cluster labels come from the existing
    * min-label propagation (one shuffle per round, O(1) plan via
    * localCheckpoint) and the final window partitions by cluster —
    * bounded groups, no global sort. */
  private def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select("doc_id", "text")
    val b = d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" zz_mutation")).as("text"))
    val c = d.select((col("doc_id") + 2000000L).as("doc_id"),
      concat(col("text"), lit(" zz_mutation zz_more")).as("text"))
    val corpus = d.unionByName(b).unionByName(c)
    val cand = d.select(col("doc_id").as("id_a"),
      (col("doc_id") + 1000000L).as("id_b"))
      .unionByName(d.select((col("doc_id") + 1000000L).as("id_a"),
        (col("doc_id") + 2000000L).as("id_b")))
    val edges = Dedup.verifyJaccard(corpus, "doc_id", "text", cand, 3)
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b")
    val nodes = corpus.select(col("doc_id").as("id"))
    val labels = Dedup.connectedComponents(nodes, edges)
    val quality = corpus.select(col("doc_id"),
      size(array_distinct(split(col("text"), " "))).cast("long")
        .as("quality"))
    import org.apache.spark.sql.expressions.Window
    labels.join(quality, col("id") === col("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("comp"))
          .orderBy(col("quality").desc, col("id"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("comp").as("cluster"), col("quality"))
      .orderBy(col("cluster"))
  }

  private val dedupKeepBestSql =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text || ' zz_mutation' FROM documents
       |  UNION ALL SELECT doc_id + 2000000, text || ' zz_mutation zz_more' FROM documents),
       |sh AS (SELECT doc_id, $shinglesSqlFrag AS s FROM corpus),
       |cand AS (
       |  SELECT doc_id AS ia, doc_id + 1000000 AS ib FROM documents
       |  UNION ALL SELECT doc_id + 1000000, doc_id + 2000000 FROM documents),
       |edges AS (
       |  SELECT c.ia AS id_a, c.ib AS id_b FROM cand c
       |  JOIN sh a ON a.doc_id = c.ia JOIN sh b ON b.doc_id = c.ib
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |        CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5),
       |sym AS (SELECT id_a AS id, id_b AS nbr FROM edges
       |        UNION SELECT id_b, id_a FROM edges),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS m FROM corpus
       |  UNION
       |  SELECT s.id, r.m FROM sym s JOIN reach r ON r.id = s.nbr),
       |comp AS (SELECT id, MIN(m) AS cluster FROM reach GROUP BY id),
       |qual AS (SELECT doc_id,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS quality
       |  FROM corpus),
       |ranked AS (SELECT c.id AS doc_id, c.cluster, q.quality,
       |  ROW_NUMBER() OVER (PARTITION BY c.cluster
       |    ORDER BY q.quality DESC, c.id) AS rk
       |  FROM comp c JOIN qual q ON q.doc_id = c.id)
       |SELECT doc_id, cluster, quality FROM ranked WHERE rk = 1
       |ORDER BY cluster""".stripMargin

  /** Leakage-safe K-fold split: the fold is derived from the CONTENT hash
    * (md5 of the text), not the doc id, so byte-identical duplicates can
    * never land in different folds — the standard guard against
    * train/test leakage when folds feed evaluation. Map-side hash + one
    * aggregation; deterministic in any engine (no RNG state). Reports
    * per-fold document and distinct-content counts. */
  private def docFold(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val fold = (conv(substring(md5(col("text")), 1, 7), 16, 10)
      .cast("long") % 5).as("fold")
    d.select(fold, md5(col("text")).as("h"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("h")).as("n_contents"))
      .orderBy(col("fold"))
  }

  private val docFoldSql =
    """SELECT CAST(list_aggregate(list_transform(range(1, 8), i ->
      |    (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT), 1)) - 1)
      |      * CAST(power(16, 7 - i) AS BIGINT)), 'sum') AS BIGINT) % 5 AS fold,
      |  COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_contents
      |FROM documents GROUP BY fold ORDER BY fold""".stripMargin

  // ----------------------------------------------------- mixture epochs

  /** Source-mixture rebalancing with REPETITION (Pile/Dolma-style
    * mixing): every source is up-/down-sampled toward an equal share of
    * the corpus character budget. Per source the exact rational rate
    * lands as integer parts-per-million (`target·10⁶ ÷ source_chars`);
    * each document gets `⌊rate⌋` copies plus one more when its salted
    * md5 bucket falls under the fractional remainder — deterministic
    * repetition with no RNG state, so the SAME docs repeat in any
    * engine/retry. Shape at 100 TB: one map-side-combinable per-source
    * aggregate (≤ sources rows) broadcast back onto a map-only pass;
    * int64 holds while corpus_chars·10⁶ < 2⁶³ (~9 PB of text) — beyond
    * that the same arithmetic moves to DECIMAL(38,0).
    * Columns: (doc_id, source, copies). */
  private def mixtureEpochs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val s = d.groupBy("source").agg(sum("n_chars").as("sc"))
    val tot = s.agg(sum(col("sc")).as("t"), count(lit(1)).as("ns"))
    val plan = s.crossJoin(broadcast(tot))
      .selectExpr("source", "(t DIV ns) * 1000000L DIV sc AS ppm")
    d.join(broadcast(plan), "source")
      .selectExpr("doc_id", "source",
        """CAST(ppm DIV 1000000L +
          |  IF(upper(substr(md5(CAST(CAST(doc_id AS STRING) || ':mix:7'
          |        AS BINARY)), 1, 4)) <
          |     lpad(hex((ppm % 1000000L) * 65536L DIV 1000000L), 4, '0'),
          |  1, 0) AS BIGINT) AS copies""".stripMargin)
  }

  private val mixtureEpochsSql =
    """WITH s AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sc
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(sc) AS BIGINT) AS t,
      |               CAST(COUNT(*) AS BIGINT) AS ns FROM s),
      |plan AS (
      |  SELECT source, (t // ns) * 1000000 // sc AS ppm FROM s, tot)
      |SELECT doc_id, d.source,
      |  CAST(ppm // 1000000 +
      |    CASE WHEN upper(substr(md5(CAST(doc_id AS VARCHAR) || ':mix:7'),
      |           1, 4)) <
      |         lpad(to_hex((ppm % 1000000) * 65536 // 1000000), 4, '0')
      |    THEN 1 ELSE 0 END AS BIGINT) AS copies
      |FROM documents d JOIN plan ON d.source = plan.source""".stripMargin

  // ------------------------------------------------- deterministic sample

  /** Stratified deterministic sample: md5 of (doc_id, salt) buckets each
    * row; per-language hex-prefix cutoffs give per-stratum rates (en 50%,
    * others ~16%). Pure map-side filter — no shuffle, no RNG state — and
    * the exact same rows survive in any engine. */
  private def docSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val bucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":sample:42"))
        .cast("binary")), 1, 2)
    d.withColumn("bucket", bucket)
      .filter(when(col("lang") === "en", col("bucket") < "80")
        .otherwise(col("bucket") < "29"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  private val docSampleSql =
    """SELECT doc_id, lang,
      |  substr(md5(CAST(doc_id AS VARCHAR) || ':sample:42'), 1, 2) AS bucket
      |FROM documents
      |WHERE CASE WHEN lang = 'en'
      |  THEN substr(md5(CAST(doc_id AS VARCHAR) || ':sample:42'), 1, 2) < '80'
      |  ELSE substr(md5(CAST(doc_id AS VARCHAR) || ':sample:42'), 1, 2) < '29'
      |  END
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ deterministic shuffle

  /** Deterministic training shuffle: each doc hashes to a shard (first
    * hex nibble) and a within-shard position (row_number over the hash).
    * Windows are PARTITIONED by shard, so at 100 TB each shard sorts
    * independently after one hash shuffle — no global single-partition
    * sort. Rerunning yields byte-identical epoch order. */
  private def trainShuffle(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val key = md5(concat(col("doc_id").cast("string"), lit(":shuffle:42"))
      .cast("binary"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("skey"), col("doc_id"))
    d.select(col("doc_id"), key.as("skey"))
      .withColumn("shard", substring(col("skey"), 1, 1))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  private val trainShuffleSql =
    """WITH k AS (SELECT doc_id,
      |  md5(CAST(doc_id AS VARCHAR) || ':shuffle:42') AS skey FROM documents)
      |SELECT doc_id, substr(skey, 1, 1) AS shard,
      |  ROW_NUMBER() OVER (PARTITION BY substr(skey, 1, 1)
      |                     ORDER BY skey, doc_id) AS pos
      |FROM k ORDER BY shard, pos""".stripMargin

  // --------------------------------------------------- token-budget pack

  /** Token-budget packing: documents stream per language in deterministic
    * order; each doc lands in training bin floor(preceding_tokens/4096).
    * The running sum is a frame-bounded window partitioned by lang — one
    * shuffle, parallel across strata, the standard sequence-packing shape
    * for context-window assembly. */
  private def tokenPack(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.select(col("doc_id"), col("lang"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("bin_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / 4096.0)
          .cast("long"))
      .orderBy(col("lang"), col("doc_id"))
  }

  private val tokenPackSql =
    """SELECT doc_id, lang,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(FLOOR(COALESCE(SUM(len(string_split(text, ' '))) OVER (
      |    PARTITION BY lang ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096.0)
      |    AS BIGINT) AS bin_id
      |FROM documents ORDER BY lang, doc_id""".stripMargin

  // --------------------------------------------------- global shard plan

  /** Corpus-wide training-shard layout ([[ShardPlan.assign]]): docs in a
    * deterministic md5-shuffled TOTAL order, cut every 16384 tokens. The
    * Spark side runs the two-pass distributed prefix sum (range
    * partition → parallel local windows → P-row offset broadcast); the
    * oracle is the equivalent naive global window, so the hash-match
    * proves the distributed decomposition computes the exact same
    * prefix sums. */
  private def shardPlan(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val okey = md5(concat(col("doc_id").cast("string"), lit(":shard:42"))
      .cast("binary"))
    ShardPlan.assign(d, "doc_id",
      TextAnalysis.tokenCount(col("text")), okey, capacity = 16384L)
      .select(col("doc_id"), col("n_tokens"), col("shard_id"))
      .orderBy(col("doc_id"))
  }

  private val shardPlanSql =
    """WITH t AS (SELECT doc_id,
      |    md5(CAST(doc_id AS VARCHAR) || ':shard:42') AS okey,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  CAST(CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY okey, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    // 16384 AS BIGINT) AS shard_id
      |FROM t ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ end-to-end pipeline

  /** The WHOLE training-data prep pipeline as ONE declarative plan:
    * quality filter (length band + repetition) → benchmark
    * decontamination (3-gram overlap, benchmark side broadcast) → exact
    * dedup ([[Dedup.exact]], hash-first) → deterministic 50% sample →
    * token-budget packing. Catalyst sees every stage at once — column
    * pruning reaches the scan, the small sides broadcast, and the only
    * wide shuffles are the per-doc aggregations and the final per-lang
    * packing window. This is the composition story: each stage is an
    * operator from this library, and the whole thing still has a
    * bit-exact SQL oracle. */
  private def trainPipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val stats = d.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val rep = d.select(col("doc_id"),
      explode(TextAnalysis.ngrams(col("text"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("mb"), sum(col("c")).as("tb"))
    val sh = d.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("g"))
    val bench = sh.filter(col("doc_id") % 97 === 0).select(col("g"))
    val contaminated = sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), Seq("g")).select("doc_id").distinct()
    val clean = d.join(stats, "doc_id").join(rep, "doc_id")
      .filter(col("doc_id") % 97 =!= 0 &&
        col("n_tokens").between(5, 1000) &&
        col("mb") * 20 < col("tb"))
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
    val keepers = Dedup.exact(clean, "doc_id", "text")
      .select(col("keeper").as("doc_id"))
    val bucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":sample:42"))
        .cast("binary")), 1, 2)
    val sampled = clean.join(keepers, "doc_id")
      .filter(bucket < "80")
      .select(col("doc_id"), col("lang"), col("n_tokens"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sampled
      .withColumn("bin_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / 4096.0)
          .cast("long"))
      .orderBy(col("lang"), col("doc_id"))
  }

  private val trainPipelineE2eSql =
    """WITH toks AS (SELECT doc_id, lang, text, string_split(text,' ') AS t FROM documents),
      |stats AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
      |bg AS (SELECT doc_id, unnest(list_transform(range(0, GREATEST(len(t)-1,0)),
      |        i -> array_to_string(t[i+1:i+2],' '))) AS g FROM toks),
      |rep AS (SELECT doc_id, MAX(c) AS mb, CAST(SUM(c) AS BIGINT) AS tb
      |        FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
      |        GROUP BY doc_id),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(0, GREATEST(len(t)-2,0)),
      |        i -> array_to_string(t[i+1:i+3],' '))) AS s FROM toks),
      |bench AS (SELECT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
      |contaminated AS (SELECT DISTINCT c.doc_id FROM
      |  (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0) c
      |  JOIN bench b ON c.g = b.g),
      |clean AS (
      |  SELECT d.doc_id, d.lang, d.text, st.n_tokens
      |  FROM documents d JOIN stats st USING (doc_id) JOIN rep USING (doc_id)
      |  WHERE d.doc_id % 97 <> 0
      |    AND st.n_tokens BETWEEN 5 AND 1000
      |    AND rep.mb * 20 < rep.tb
      |    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
      |dedup AS (SELECT MIN(doc_id) AS doc_id FROM clean GROUP BY text),
      |sampled AS (SELECT c.doc_id, c.lang, c.n_tokens FROM clean c
      |            JOIN dedup u ON c.doc_id = u.doc_id
      |            WHERE substr(md5(CAST(c.doc_id AS VARCHAR) || ':sample:42'),1,2) < '80')
      |SELECT doc_id, lang, n_tokens,
      |  CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0)/4096.0) AS BIGINT) AS bin_id
      |FROM sampled ORDER BY lang, doc_id""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("dedup_clusters", dedupClusters, Some(dedupClustersSql)),
    QueryDef("dedup_keep_best", dedupKeepBest, Some(dedupKeepBestSql)),
    QueryDef("doc_fold", docFold, Some(docFoldSql)),
    QueryDef("train_pipeline_e2e", trainPipelineE2e, Some(trainPipelineE2eSql)),
    QueryDef("doc_sample", docSample, Some(docSampleSql)),
    QueryDef("mixture_epochs", mixtureEpochs, Some(mixtureEpochsSql)),
    QueryDef("train_shuffle", trainShuffle, Some(trainShuffleSql)),
    QueryDef("token_pack", tokenPack, Some(tokenPackSql)),
    QueryDef("shard_plan", shardPlan, Some(shardPlanSql)),
  )
}
