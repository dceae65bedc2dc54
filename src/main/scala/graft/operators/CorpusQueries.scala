package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene and analytics operators a large-scale training-data
  * pipeline needs beyond dedup: benchmark decontamination, keyword
  * retrieval, repetition-based quality filtering, event sessionization,
  * and the window-frame surface (RANGE frames, ntile, percent_rank,
  * lead, first_value).
  *
  * All queries are exact-arithmetic (integer counts, scaled-long money,
  * single IEEE divisions) so every one has a bit-exact DuckDB oracle.
  */
object CorpusQueries extends QueryPack {

  // -------------------------------------------------- decontamination

  /** Benchmark decontamination: flag corpus documents sharing any
    * distinct word 3-gram with a held-out benchmark slice (here: doc_id
    * divisible by 97 stands in for the eval set). The benchmark side of
    * the join is BROADCAST — real eval sets are tiny next to a 100 TB
    * corpus, so the corpus never shuffles; each task streams its shingles
    * past the in-memory benchmark index (the standard n-gram-overlap
    * decontamination used before training runs). */
  private def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val sh = d.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("g"))
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("bid"), col("g"))
    val corp = sh.filter(col("doc_id") % 97 =!= 0)
    corp.join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bid")).as("n_bench_hits"))
      .orderBy(col("doc_id"))
  }

  private val decontaminateSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |    range(0, GREATEST(len(t)-2, 0)),
      |    i -> array_to_string(t[i+1:i+3],' '))) AS s FROM toks),
      |bench AS (SELECT doc_id AS bid, unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
      |corp  AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
      |SELECT c.doc_id, COUNT(DISTINCT b.bid) AS n_bench_hits
      |FROM corp c JOIN bench b ON c.g = b.g
      |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------- keyword search

  /** Length-normalized term-frequency retrieval: top-20 documents for a
    * keyword, scored tf·10⁴ / doc_len in pure integer arithmetic (no
    * floats → bit-exact across engines; a weighted-idf variant would sit
    * on the same shape with the idf factors broadcast from a tiny
    * term-stats table). Map-side score + TakeOrderedAndProject — no
    * shuffle beyond the global top-k. */
  private def keywordTopk(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val toks = split(col("text"), " ")
    val tf = size(filter(toks, x => x === lit("table"))).cast("long")
    val n = size(toks).cast("long")
    d.select(col("doc_id"), tf.as("tf"), n.as("n_tokens"))
      .withColumn("score", expr("tf * 10000 div n_tokens"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  private val keywordTopkSql =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text,' '), x -> x = 'table')) AS BIGINT) AS tf,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(string_split(text,' '), x -> x = 'table')) AS BIGINT) * 10000
      |    // CAST(len(string_split(text,' ')) AS BIGINT) AS score
      |FROM documents
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** Contamination-ratio scoring (the PaLM/GPT-4-style decontamination
    * decision): per corpus document, the fraction of its distinct
    * 3-grams that appear anywhere in the benchmark set; documents at or
    * above 5% overlap are flagged. One broadcast of the distinct bench
    * grams + ONE shuffle on doc_id (left-join + conditional count in the
    * same aggregation); the ratio is scaled-integer (×10⁶, integer
    * division) so both engines hash identically — no float thresholds.
    * At 100 TB the corpus side never reshuffles per bench row; the
    * bench set (distinct grams of the eval suites) is broadcast-class
    * by construction. */
  private def contaminationScore(spark: SparkSession,
      dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val sh = d.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("g"))
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select("g").distinct().withColumn("hit", lit(1L))
    val corp = sh.filter(col("doc_id") % 97 =!= 0)
    corp.join(broadcast(bench), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .filter(col("n_hits") * 20 >= col("n_grams"))
      .withColumn("score",
        expr("n_hits * 1000000 div n_grams"))
      .orderBy(col("doc_id"))
  }

  private val contaminationScoreSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(0, GREATEST(len(t)-2, 0)),
      |    i -> array_to_string(t[i+1:i+3],' ')))) AS g FROM toks),
      |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
      |corp AS (SELECT doc_id, g FROM sh WHERE doc_id % 97 <> 0),
      |j AS (SELECT c.doc_id, COUNT(*) AS n_grams, COUNT(b.g) AS n_hits
      |      FROM corp c LEFT JOIN bench b USING (g) GROUP BY c.doc_id)
      |SELECT doc_id, n_grams, n_hits, n_hits * 1000000 // n_grams AS score
      |FROM j WHERE n_hits * 20 >= n_grams ORDER BY doc_id""".stripMargin

  /** Single-term BM25 retrieval (k1=1.2, b=0.75): the classic saturated-
    * TF × length-normalization ranking. For one term the idf factor is a
    * shared constant, so it is dropped from the score without changing
    * the order, and the remaining rational function is cleared of
    * fractions — score = ⌊10⁶·44·T·tf / (20·T·tf + 6·T + 18·dl·N)⌋ with
    * T = corpus token count, N = doc count — so the whole computation is
    * BIGINT and hashes identically on both engines. Corpus totals come
    * from a 1-row aggregate cross-joined back (broadcast), so the plan
    * stays fully distributed: map-side score + TakeOrderedAndProject. */
  private def bm25Topk(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val toks = split(col("text"), " ")
    val base = d.select(col("doc_id"),
      size(filter(toks, x => x === lit("table"))).cast("long").as("tf"),
      size(toks).cast("long").as("dl"))
    val tot = base.agg(sum(col("dl")).as("t"), count(lit(1)).as("n"))
    base.filter(col("tf") > 0)
      .crossJoin(broadcast(tot))
      .withColumn("score",
        expr("tf * 44 * t * 1000000 div (20*t*tf + 6*t + 18*dl*n)"))
      .select("doc_id", "tf", "dl", "score")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  private val bm25TopkSql =
    """WITH base AS (SELECT doc_id,
      |  CAST(len(list_filter(string_split(text,' '), x -> x = 'table')) AS BIGINT) AS tf,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS dl FROM documents),
      |tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS t, COUNT(*) AS n FROM base)
      |SELECT doc_id, tf, dl,
      |  tf * 44 * t * 1000000 // (20*t*tf + 6*t + 18*dl*n) AS score
      |FROM base, tot WHERE tf > 0
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** Cross-source overlap matrix (corpus-redundancy analytics: how much
    * n-gram content two ingestion sources share — the report that decides
    * which sources to dedup against each other). Distinct (source, 3-gram)
    * pairs self-join on the gram; fanout per gram is bounded by
    * sources², and source count is small by construction, so the join is
    * skew-safe at corpus scale. Jaccard is scaled-integer (ppm). */
  private def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val grams = d.select(col("source"),
      explode(Dedup.shingles(col("text"), 3)).as("g")).distinct()
    val inter = grams.select(col("source").as("src_a"), col("g"))
      .join(grams.select(col("source").as("src_b"), col("g")), Seq("g"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("n").as("na"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("n").as("nb"))), Seq("src_b"))
      .withColumn("jaccard_ppm",
        expr("n_common * 1000000 div (na + nb - n_common)"))
      .select("src_a", "src_b", "n_common", "jaccard_ppm")
      .orderBy("src_a", "src_b")
  }

  private val sourceOverlapSql =
    """WITH toks AS (SELECT source, string_split(text,' ') AS t FROM documents),
      |g0 AS (SELECT source, unnest(list_distinct(list_transform(
      |    range(0, GREATEST(len(t)-2, 0)),
      |    i -> array_to_string(t[i+1:i+3],' ')))) AS g FROM toks),
      |g AS (SELECT DISTINCT source, g FROM g0),
      |sizes AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
      |inter AS (SELECT a.source AS src_a, b.source AS src_b,
      |    COUNT(*) AS n_common
      |  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, n_common,
      |  n_common * 1000000 // (sa.n + sb.n - n_common) AS jaccard_ppm
      |FROM inter JOIN sizes sa ON sa.source = src_a
      |JOIN sizes sb ON sb.source = src_b
      |ORDER BY src_a, src_b""".stripMargin

  // ----------------------------------------------- repetition filtering

  /** Repetition-based quality filter (Gopher-style): documents whose most
    * frequent word bigram makes up ≥5% of all bigrams. Bigrams explode →
    * two hash aggregations, both map-side combinable; the comparison is
    * integer (max·20 ≥ total), no float thresholds. */
  private def qualityRepetition(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(col("doc_id"), explode(TextAnalysis.ngrams(col("text"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_bigram"), sum(col("c")).as("total_bigrams"))
      .filter(col("max_bigram") * 20 >= col("total_bigrams"))
      .orderBy(col("doc_id"))
  }

  private val qualityRepetitionSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(list_transform(range(0, GREATEST(len(t)-1,0)),
      |        i -> array_to_string(t[i+1:i+2],' '))) AS g FROM toks),
      |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
      |agg AS (SELECT doc_id, MAX(c) AS max_bigram,
      |        CAST(SUM(c) AS BIGINT) AS total_bigrams
      |        FROM cnt GROUP BY doc_id)
      |SELECT doc_id, max_bigram, total_bigrams
      |FROM agg WHERE max_bigram * 20 >= total_bigrams
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- Gopher-style quality rules

  /** Gopher-rule quality gate (Rae et al. 2021 §A1.1, public): word-count
    * bounds, mean word length, symbol-word ratio, alphabetic-word
    * fraction, stop-word floor — each document scored map-only in one
    * pass over its token array. Every threshold is INTEGER arithmetic
    * (3·wc ≤ chars ≤ 10·wc, 5·alpha ≥ 4·wc, …), so both engines agree
    * bit-exactly; at 100 TB this is a map-only filter with no shuffle. */
  private def qualityGopher(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val words = filter(split(col("text"), " "), w => w =!= lit(""))
    val wc = size(col("w")).cast("long")
    val chars = aggregate(col("w"), lit(0L),
      (a, w) => a + length(w).cast("long"))
    val alpha = size(filter(col("w"),
      w => w.rlike("[A-Za-z]"))).cast("long")
    val sym = size(filter(col("w"),
      w => w.startsWith("#") || w.contains("..."))).cast("long")
    val stops = size(filter(col("w"), w => lower(w).isin(
      "the", "be", "to", "of", "and", "that", "have", "with"))).cast("long")
    d.select(col("doc_id"), words.as("w"))
      .select(col("doc_id"), wc.as("word_count"), chars.as("char_sum"),
        alpha.as("alpha_words"), sym.as("symbol_words"),
        stops.as("stop_words"))
      .withColumn("pass",
        col("word_count").between(50L, 100000L) &&
          col("char_sum") >= col("word_count") * 3 &&
          col("char_sum") <= col("word_count") * 10 &&
          col("alpha_words") * 5 >= col("word_count") * 4 &&
          col("symbol_words") * 10 <= col("word_count") &&
          col("stop_words") >= 2L)
      .orderBy(col("doc_id"))
  }

  private val qualityGopherSql =
    """WITH w AS (SELECT doc_id,
      |  list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |m AS (SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS word_count,
      |  CAST(list_aggregate(list_prepend(0, list_transform(w,
      |    x -> CAST(length(x) AS BIGINT))), 'sum') AS BIGINT) AS char_sum,
      |  CAST(len(list_filter(w,
      |    x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
      |  CAST(len(list_filter(w, x -> starts_with(x, '#')
      |    OR contains(x, '...'))) AS BIGINT) AS symbol_words,
      |  CAST(len(list_filter(w, x -> list_contains(
      |    ['the','be','to','of','and','that','have','with'],
      |    lower(x)))) AS BIGINT) AS stop_words
      |  FROM w)
      |SELECT doc_id, word_count, char_sum, alpha_words, symbol_words,
      |  stop_words,
      |  (word_count BETWEEN 50 AND 100000
      |   AND char_sum >= word_count * 3 AND char_sum <= word_count * 10
      |   AND alpha_words * 5 >= word_count * 4
      |   AND symbol_words * 10 <= word_count
      |   AND stop_words >= 2) AS pass
      |FROM m ORDER BY doc_id""".stripMargin

  // --------------------------------------------- domain-mixture sampling

  /** Domain-mix resampling: downsample each `source` stratum to a target
    * mixture (25% per source here) of the ORIGINAL corpus size. Per-group
    * keep-rates derive from group counts (rate = share·total/count, capped
    * at 1), the threshold becomes a 6-hex-digit string both engines
    * format identically from integer floor(rate·16^6), and membership is
    * a deterministic md5 test — the engine-portable scale shape: one tiny
    * count aggregate broadcast back onto a map-only filter, no shuffle of
    * the corpus itself. */
  private def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val counts = d.groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("total", sum(col("cnt")).over())
    // keep-everything groups compare against 'g' (> every hex digit), so
    // a full-rate stratum is never excluded by the 6-hex-digit threshold
    val rates = counts.withColumn("rate",
      lit(0.02) * col("total") / col("cnt"))
      .withColumn("thresh", when(col("rate") >= 1.0, lit("g"))
        .otherwise(lpad(lower(hex(floor(col("rate") * lit(16777216.0))
          .cast("long"))), 6, "0")))
      .select(col("source"), col("thresh"))
    d.select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .filter(substring(md5(concat(col("doc_id").cast("string"),
        lit(":mix:42")).cast("binary")), 1, 6) < col("thresh"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  private val domainMixSql =
    """WITH c AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS cnt,
      |  CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS total
      |  FROM documents GROUP BY source),
      |r AS (SELECT source,
      |  CASE WHEN 0.02 * total / cnt >= 1.0 THEN 'g'
      |       ELSE lpad(lower(hex(CAST(floor(0.02 * total / cnt
      |         * 16777216.0) AS BIGINT))), 6, '0') END AS thresh
      |  FROM c)
      |SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
      |WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix:42'), 1, 6)
      |      < r.thresh
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------ sessionization

  /** Event sessionization: a session breaks after a 30-minute gap.
    * Classic two-window shape — lag to mark breaks, running sum to number
    * sessions — BOTH windows share one (user_id) partitioning, so the
    * whole query is a single shuffle however many events per user; gap
    * arithmetic is integer microseconds (bit-exact). */
  private def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    ev
      .withColumn("brk",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        expr("(max(us) - min(us)) div 1000000").as("dur_s"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_events"),
        max(col("dur_s")).as("max_dur_s"))
      .orderBy(col("user_id"))
  }

  private val sessionStatsSql =
    """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (SELECT user_id, us, event_id,
      |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess FROM o),
      |g AS (SELECT user_id, sess, COUNT(*) AS n_events,
      |        (MAX(us)-MIN(us))//1000000 AS dur_s
      |      FROM s GROUP BY user_id, sess)
      |SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_events,
      |  MAX(dur_s) AS max_dur_s
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------ corpus n-gram stats

  /** Corpus-wide top-50 trigrams by raw occurrence count — the n-gram
    * frequency table a tokenizer/contamination audit starts from. The
    * explode fans out ~|tokens| rows per doc but the groupBy is map-side
    * combinable, so the shuffle carries only the distinct-ngram partials
    * per task; top-k is TakeOrdered, never a global sort. */
  private def corpusNgrams(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(explode(TextAnalysis.ngrams(col("text"), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("g"))
      .limit(50)
  }

  private val corpusNgramsSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      |tg AS (SELECT unnest(list_transform(range(0, GREATEST(len(t)-2,0)),
      |        i -> array_to_string(t[i+1:i+3],' '))) AS g FROM toks)
      |SELECT g, COUNT(*) AS n FROM tg GROUP BY g
      |ORDER BY n DESC, g LIMIT 50""".stripMargin

  // ------------------------------------------------- document chunking

  /** Context-window chunking: 32-token windows, 8-token overlap (stride
    * 24), last partial window kept — the sequence-assembly step before
    * packing. Map-only (no shuffle before the presentation sort). */
  private def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(col("doc_id"),
      explode(TextAnalysis.chunk(col("text"), 32, 8)).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        col("c.chunk_text").as("chunk_text"))
      .withColumn("n_tokens",
        size(split(col("chunk_text"), " ")).cast("long"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val docChunksSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      |ch AS (SELECT doc_id, unnest(list_transform(range(0, GREATEST(len(t),1), 24),
      |        i -> struct_pack(cid := i // 24,
      |               chunk := array_to_string(t[i+1:i+32], ' ')))) AS c FROM toks)
      |SELECT doc_id, CAST(c.cid AS BIGINT) AS chunk_id, c.chunk AS chunk_text,
      |  CAST(len(string_split(c.chunk,' ')) AS BIGINT) AS n_tokens
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------- PII redaction

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpRe = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII scrubbing: count and redact emails/IPv4s per document (planted
    * deterministically on doc_id % 7 — the synthetic corpus has none).
    * Pure per-row regex in codegen — no shuffle at all; the patterns live
    * in the restricted regex subset (character classes, bounded repeats,
    * word boundaries) that Java regex and RE2 evaluate identically, which
    * is what makes the redaction oracle-exact across engines. */
  private def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val aug = when(col("doc_id") % 7 === 0,
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com at 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".5")))
      .otherwise(col("text"))
    d.select(col("doc_id"), aug.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(IpRe), lit(0)))
          .cast("long").as("n_ips"),
        md5(regexp_replace(
          regexp_replace(col("t"), lit(EmailRe), lit("<EMAIL>")),
          lit(IpRe), lit("<IP>")).cast("binary")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  private val piiRedactSql =
    """WITH aug AS (SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0
      |    THEN text || ' contact user' || doc_id || '@example.com at 10.0.' || (doc_id % 256) || '.5'
      |    ELSE text END AS t FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
      |  md5(regexp_replace(regexp_replace(t,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
      |FROM aug ORDER BY doc_id""".stripMargin

  // ------------------------------------------- streaming sessionization

  /** Streaming twin of [[sessionStats]]: the events file replayed through
    * a file stream into [[graft.streaming.Sessionize]]
    * (`flatMapGroupsWithState`, per-user O(1) state, event-time
    * timeouts). With AvailableNow the final open session per user never
    * closes (no later watermark advance), so the oracle is exactly "all
    * sessions except each user's last" — which makes the custom-state
    * streaming operator itself oracle-checkable. */
  private def streamSessions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sess")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(Tables(spark, dir).eventsRawPath))
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
    // huge watermark delay: no-data batches then never fire event-time
    // timeouts, so output is EXACTLY the gap-closed sessions ("all but
    // each user's last") — the deterministic set the oracle computes.
    // The timeout path is exercised by SessionizeSpec instead.
    val sessions = graft.streaming.Sessionize.fromStream(stream, 30,
      watermarkDelay = "3650 days")
    val qn = s"sess_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(qn)
      .select(col("userId").as("user_id"), col("startUs").as("start_us"),
        col("nEvents").as("n_events"), col("durS").as("dur_s"))
      .orderBy(col("user_id"), col("start_us"))
  }

  private val streamSessionsSql =
    """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (SELECT user_id, us, event_id,
      |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess FROM o),
      |g AS (SELECT user_id, sess, MIN(us) AS start_us, COUNT(*) AS n_events,
      |        (MAX(us)-MIN(us))//1000000 AS dur_s
      |      FROM s GROUP BY user_id, sess)
      |SELECT user_id, start_us, n_events, dur_s FROM g
      |WHERE sess < (SELECT MAX(sess) FROM g g2 WHERE g2.user_id = g.user_id)
      |ORDER BY user_id, start_us""".stripMargin

  // ----------------------------------------------------- corpus summary

  /** Per-source corpus report: doc/token/char counts, language spread,
    * distinct-content count (dedup rate numerator) — the first dashboard
    * a data-curation run produces. One hash aggregation, all counts
    * map-side combinable except the distincts (expand once). */
  private def corpusSummary(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(md5(col("text").cast("binary")))
          .as("n_unique_texts"))
      .orderBy(col("source"))
  }

  private val corpusSummarySql =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  COUNT(DISTINCT md5(text)) AS n_unique_texts
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------- streaming dedup

  /** Streaming exact dedup: the events file replayed TWICE through a file
    * stream (two links → two micro-batches of identical rows) into
    * `dropDuplicates` keyed on event_id — Spark's stateful streaming
    * dedup keeps one copy per key ACROSS batches, so the output matches a
    * single batch scan exactly. At 100 TB/day the state shards by key
    * hash; with a watermark (`dropDuplicatesWithinWatermark`) state stays
    * bounded by the dedup horizon. */
  private def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sdd")
    val src = java.nio.file.Paths.get(Tables(spark, dir).eventsRawPath)
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("replay1.parquet"), src)
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("replay2.parquet"), src)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // two batches → state carries
      .parquet(streamDir.toString)
    val deduped = stream.dropDuplicates("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val qn = s"sdd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(qn).orderBy(col("event_id"))
  }

  private val streamDedupSql =
    """SELECT event_id, user_id, event_type
      |FROM events ORDER BY event_id""".stripMargin

  // -------------------------------------------------- window-frame surface

  /** Window-frame variety on one (o_custkey) partitioning: RANGE frame
    * running sum (scaled-long money), ntile, percent_rank, lead,
    * first_value — all five share the single shuffle+sort. percent_rank's
    * (rank-1)/(n-1) is one IEEE division of two exact ints, bit-identical
    * across engines. */
  private def qWindowFrames(spark: SparkSession, dir: String): DataFrame = {
    import graft.QueryDsl._
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val wr = w.rangeBetween(-1000, Window.currentRow)
    t.orders
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(sl2(col("o_totalprice"))).over(wr).as("range_sum"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        first_value(col("o_orderkey")).over(w).as("first_key"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val qWindowFramesSql = {
    import graft.QueryDsl._
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(SUM(${oSl2("o_totalprice")}) OVER (
       |    PARTITION BY o_custkey ORDER BY o_orderkey
       |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS range_sum,
       |  NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile,
       |  PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pr,
       |  LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_key,
       |  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS first_key
       |FROM orders WHERE o_custkey < 200
       |ORDER BY o_custkey, o_orderkey""".stripMargin
  }

  // ------------------------------------------- per-source TF-IDF profile

  /** Top-10 characteristic terms per ingestion source by TF-IDF — the
    * per-domain vocabulary profile a mixture audit reads. idf is the
    * scaled-integer ratio sources/df (floor ×1e6) so scores hash-match
    * DuckDB exactly. Scale shape: tf is one map-side-combinable shuffle on
    * (source, term); df aggregates FROM tf (already distinct — no second
    * pass over occurrences); the source count is a broadcast 1-row agg;
    * top-10 is a per-source window over ≤|vocab| rows, partitioned by
    * source so no single-partition window. */
  private def tfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val tok = d.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val tf = tok.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w"))
      .agg(countDistinct(col("source")).as("df"))
    val nSrc = d.select(countDistinct(col("source")).as("s"))
    val scored = tf.join(df, "w").crossJoin(broadcast(nSrc))
      .select(col("source"), col("w").as("term"),
        (col("tf") * expr("(s * 1000000) DIV df")).as("score"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 10)
      .select(col("source"), col("term"), col("score").cast("long"))
      .orderBy(col("source"), col("score").desc, col("term"))
  }

  private val tfidfTermsSql =
    """WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS w FROM documents),
      |tf AS (SELECT source, w, COUNT(*) AS tf FROM tok GROUP BY source, w),
      |df AS (SELECT w, COUNT(DISTINCT source) AS df FROM tf GROUP BY w),
      |ns AS (SELECT COUNT(DISTINCT source) AS s FROM documents),
      |sc AS (SELECT source, w AS term, tf * ((s * 1000000) // df) AS score
      |       FROM tf JOIN df USING (w) CROSS JOIN ns),
      |rk AS (SELECT source, term, score, ROW_NUMBER() OVER
      |        (PARTITION BY source ORDER BY score DESC, term) AS rn FROM sc)
      |SELECT source, term, CAST(score AS BIGINT) AS score FROM rk
      |WHERE rn <= 10 ORDER BY source, score DESC, term""".stripMargin

  // ------------------------------------------------ Zipf token histogram

  /** Token-frequency power-law histogram: terms bucketed by
    * floor(log2(count)) — the corpus-health curve (a healthy natural
    * corpus is near-Zipfian; synthetic or templated data shows up as
    * spikes). The bucket is computed as length(bin(c))-1, pure integer in
    * both engines — no float log2 at bucket boundaries. One shuffle
    * (term counts); the histogram itself is ≤64 rows. */
  private def tokenZipf(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .groupBy((length(bin(col("c"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("c")).cast("long").as("occurrences"))
      .orderBy(col("bucket"))
  }

  private val tokenZipfSql =
    """WITH tok AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
      |c AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w)
      |SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  CAST(SUM(c) AS BIGINT) AS occurrences
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("decontaminate", decontaminate, Some(decontaminateSql)),
    QueryDef("contamination_score", contaminationScore,
      Some(contaminationScoreSql)),
    QueryDef("keyword_topk", keywordTopk, Some(keywordTopkSql)),
    QueryDef("bm25_topk", bm25Topk, Some(bm25TopkSql)),
    QueryDef("source_overlap", sourceOverlap, Some(sourceOverlapSql)),
    QueryDef("quality_repetition", qualityRepetition, Some(qualityRepetitionSql)),
    QueryDef("quality_gopher", qualityGopher, Some(qualityGopherSql)),
    QueryDef("domain_mix", domainMix, Some(domainMixSql)),
    QueryDef("pii_redact", piiRedact, Some(piiRedactSql)),
    QueryDef("corpus_ngrams", corpusNgrams, Some(corpusNgramsSql)),
    QueryDef("doc_chunks", docChunks, Some(docChunksSql)),
    QueryDef("corpus_summary", corpusSummary, Some(corpusSummarySql)),
    QueryDef("session_stats", sessionStats, Some(sessionStatsSql)),
    QueryDef("stream_sessions", streamSessions, Some(streamSessionsSql)),
    QueryDef("stream_dedup", streamDedup, Some(streamDedupSql)),
    QueryDef("q_window_frames", qWindowFrames, Some(qWindowFramesSql)),
    QueryDef("tfidf_terms", tfidfTerms, Some(tfidfTermsSql)),
    QueryDef("token_zipf", tokenZipf, Some(tokenZipfSql)),
    QueryDef("bpe_merges", bpeMerges, Some(bpeMergesSql)),
    QueryDef("bpe_encode", bpeEncode, Some(bpeEncodeSql)),
  )

  /** Distributed BPE tokenizer-training merges ([[Bpe.merges]]): 6 rounds
    * of weighted pair counting + greedy merge over the distinct-word
    * vocabulary. The oracle replays every round as unrolled CTEs — pair
    * counts via 1-based list indexing, the merge as the identical
    * delimiter-bounded string replace — so the chosen merges and their
    * counts hash-match exactly. */
  private def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    Bpe.merges(Tables(spark, dir).documents, "text", rounds = 6)

  /** one unrolled BPE round: count pairs over s$i, pick best, rewrite */
  private def bpeRoundSql(i: Int): String =
    s"""e$i AS (
       |  SELECT unnest(range(1, len(syms))) AS j, syms, f FROM (
       |    SELECT string_split(trim(r, '|'), '|') AS syms, f FROM s$i) q
       |  WHERE len(syms) >= 2),
       |p$i AS (
       |  SELECT syms[j] AS l, syms[j+1] AS rr, CAST(SUM(f) AS BIGINT) AS cnt
       |  FROM e$i GROUP BY 1, 2),
       |b$i AS (SELECT l, rr, cnt FROM p$i ORDER BY cnt DESC, l, rr LIMIT 1),
       |s${i + 1} AS (
       |  SELECT replace(r, '|' || b.l || '|' || b.rr || '|',
       |                    '|' || b.l || b.rr || '|') AS r, f
       |  FROM s$i, b$i b)""".stripMargin

  private val bpeMergesSql =
    s"""WITH w AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
       |  WHERE word <> '' GROUP BY word),
       |s1 AS (SELECT '|' || regexp_replace(word, '(.)', '\\1|', 'g') AS r, f
       |       FROM w),
       |${(1 to 6).map(bpeRoundSql).mkString(",\n")}
       |SELECT * FROM (
       |${(1 to 6).map(i =>
            s"  SELECT CAST($i AS INT) AS round, l AS lhs, rr AS rhs, cnt FROM b$i")
            .mkString("\n  UNION ALL\n")}
       |) ORDER BY round""".stripMargin

  /** BPE ENCODE ([[Bpe.encode]]): the 6 trained merges applied to every
    * document — per-doc token counts after merging. Spark trains via
    * [[Bpe.merges]] and embeds the pairs as plan literals (map-only
    * encode pass); the oracle re-derives the same 6 merges through the
    * bpe_merges CTE chain and applies the identical chained replace, so
    * token counts hash-match exactly. */
  private def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val pairs = Bpe.merges(docs, "text", rounds = 6)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    Bpe.encode(docs, "text", "doc_id", pairs)
  }

  private val bpeEncodeSql = {
    val rep = "'|' || regexp_replace(w, '(.)', '\\1|', 'g')"
    val chained = (1 to 6).foldLeft(rep) { (e, i) =>
      s"replace($e, '|' || b$i.l || '|' || b$i.rr || '|', " +
        s"'|' || b$i.l || b$i.rr || '|')"
    }
    s"""WITH w AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
       |  WHERE word <> '' GROUP BY word),
       |s1 AS (SELECT '|' || regexp_replace(word, '(.)', '\\1|', 'g') AS r, f
       |       FROM w),
       |${(1 to 6).map(bpeRoundSql).mkString(",\n")}
       |SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
       |    AS BIGINT) AS n_words,
       |  CAST(coalesce(list_sum(list_transform(
       |    list_filter(string_split(text, ' '), w -> w <> ''),
       |    w -> len(string_split(trim($chained, '|'), '|')))), 0)
       |    AS BIGINT) AS n_tokens
       |FROM documents, b1, b2, b3, b4, b5, b6""".stripMargin
  }
}
