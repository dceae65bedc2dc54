package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions: sentence/paragraph-level dedup with document
  * reassembly, gap-filled time-series resampling with forward fill,
  * int8 embedding quantization, and one-pass distributed PCA.
  *
  * Everything follows the pack conventions: exact integer/string
  * arithmetic (or boolean-verified invariants where the math is not
  * SQL-expressible) so each query has a DuckDB oracle, and every plan is
  * written for the 100 TB shape — map-only where possible, one keyed
  * shuffle where not, fixed-size aggregate state for the linear algebra.
  */
object SeriesQueries extends QueryPack {

  // ------------------------------------------- sentence-level dedup

  /** Sentence/paragraph-level exact dedup with reassembly — the
    * boilerplate-removal pass run corpus-wide before training (CCNet /
    * RefinedWeb style): split each document into non-overlapping 10-token
    * sentences, keep only each sentence's FIRST global occurrence
    * (ordered by doc_id, position), and stitch every document back
    * together from its surviving sentences.
    *
    * Scale shape: one shuffle keyed on the sentence text (the dedup
    * window — at 100 TB you'd key on xxhash64(sentence) instead, same
    * plan), one shuffle back on doc_id for reassembly. No driver-side
    * anything; both aggregations are hash-based. */
  private def dedupSentences(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val toks = split(col("text"), " ")
    val nChunks = floor((size(toks) - 1) / lit(10.0)).cast("int")
    val chunks = d.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), greatest(nChunks, lit(0))),
        i => concat_ws(" ", slice(toks, i * 10 + 1, lit(10))))))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "c")
    val w = Window.partitionBy(col("c")).orderBy(col("doc_id"), col("idx"))
    chunks.withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("rn") === 1,
            struct(col("idx"), col("c"))))),
          s => s.getField("c"))).as("text_dedup"))
      .orderBy(col("doc_id"))
  }

  private val dedupSentencesSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t,
      |          unnest(range(0, GREATEST((len(t)-1)//10, 0) + 1)) AS i
      |        FROM toks),
      |chunks AS (SELECT doc_id, i AS idx,
      |             array_to_string(t[i*10+1 : i*10+10], ' ') AS c
      |           FROM idx),
      |rn AS (SELECT doc_id, idx, c,
      |         ROW_NUMBER() OVER (PARTITION BY c ORDER BY doc_id, idx) AS rn
      |       FROM chunks)
      |SELECT doc_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  COALESCE(string_agg(CASE WHEN rn = 1 THEN c END, ' ' ORDER BY idx), '')
      |    AS text_dedup
      |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------- time-series gap fill

  /** Resample events to a dense per-type hourly series: hours with no
    * events appear with n=0, and the running total carries forward the
    * last seen hour's value (the standard gap-fill + LOCF pair every
    * monitoring/feature-engineering pipeline needs). Value sums are
    * scaled-long exact.
    *
    * Scale shape: the corpus-sized work is ONE hash aggregation on
    * (type, hour); the grid generation explodes from the per-type
    * [min,max] span — rows ∝ hours, not events — and the forward-fill
    * window runs per type over that already-small series. At 100 TB the
    * aggregated series for years of data is still only millions of rows. */
  private def tsGapfill(spark: SparkSession, dir: String): DataFrame = {
    import graft.QueryDsl._
    val ev = Tables(spark, dir).events
    val byHour = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), sum(sl2(col("value"))).as("total_c"))
    val grid = byHour.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(byHour, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("total_c"), ignoreNulls = true).over(w).as("ffill_total"))
      .orderBy(col("event_type"), col("h"))
  }

  private val tsGapfillSql =
    """WITH byh AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
      |    CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM byh GROUP BY 1),
      |grid AS (SELECT event_type,
      |           unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |         FROM span)
      |SELECT g.event_type, g.h, COALESCE(b.n, 0) AS n,
      |  LAST_VALUE(b.total_c IGNORE NULLS) OVER (
      |    PARTITION BY g.event_type ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_total
      |FROM grid g LEFT JOIN byh b USING (event_type, h)
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------- int8 quantization

  /** Symmetric int8 scalar quantization of embeddings (the compression
    * step before shipping vectors to an ANN index): per-vector scale =
    * max |x|, codes = round(x/scale·127). Map-only, pure column
    * expressions; all arithmetic is float→double exact + one IEEE
    * division both engines execute identically, so codes are bit-exact
    * cross-engine. Codes surface as a comma-joined string (engine-neutral
    * array spelling). */
  private def embedScalarQuant(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val xd = transform(col("embedding"), x => x.cast("double"))
    val scale = array_max(transform(xd, x => abs(x)))
    e.select(col("vec_id"), scale.as("scale"),
        col("embedding").alias("_e"))
      .select(col("vec_id"), col("scale"),
        concat_ws(",", transform(transform(col("_e"), x => x.cast("double")),
          x => floor(x / col("scale") * 127 + 0.5).cast("int").cast("string")))
          .as("codes"),
        size(col("_e")).cast("long").as("n_dims"))
      .orderBy(col("vec_id"))
  }

  private val embedScalarQuantSql =
    """SELECT vec_id,
      |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
      |  array_to_string(list_transform(embedding,
      |    x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) * 127 + 0.5) AS INT) AS VARCHAR)), ',') AS codes,
      |  CAST(len(embedding) AS BIGINT) AS n_dims
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ------------------------------------------- PCA

  /** One-pass distributed PCA over the embeddings, reported as verifiable
    * invariants (eigenvectors are engine-specific, so — like
    * cb_approx_uniq — the oracle checks booleans the math guarantees):
    * per component, eigenvalues are non-increasing, the population
    * variance of the projected corpus matches the eigenvalue to 1e-6
    * relative, and the component is orthonormal to all previous ones.
    * PcaSpec additionally checks the model against an exact covariance on
    * a small slice. */
  private def embedPca(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).embeddings
    val k = 4
    val model = Pca.fit(e, "embedding", k)
    val projected = Pca.transform(e, "embedding", model)
    // population variance per projected coordinate in one agg pass
    val aggs = (0 until k).flatMap { j =>
      val p = col("proj").getItem(j)
      Seq(sum(p * p).as(s"ss_$j"), sum(p).as(s"s_$j"))
    }
    val r = projected.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = model.n.toDouble
    val rows = (0 until k).map { j =>
      val ss = r.getAs[Double](s"ss_$j"); val s = r.getAs[Double](s"s_$j")
      val variance = ss / n - (s / n) * (s / n)
      val ev = model.eigenvalues(j)
      val monotone = j == 0 || model.eigenvalues(j - 1) >= ev - 1e-12
      val matches = math.abs(variance - ev) <= 1e-6 * math.max(ev, 1e-12)
      val comp = model.components(j)
      val normOk = math.abs(comp.map(x => x * x).sum - 1.0) < 1e-8
      val orthoOk = (0 until j).forall { l =>
        math.abs(comp.zip(model.components(l)).map { case (a, b) => a * b }.sum) < 1e-7
      }
      (j.toLong, monotone, matches, normOk && orthoOk)
    }
    rows.toDF("component", "var_monotone", "var_matches_eigenvalue",
      "orthonormal").orderBy(col("component"))
  }

  private val embedPcaSql =
    """SELECT CAST(i AS BIGINT) AS component, TRUE AS var_monotone,
      |  TRUE AS var_matches_eigenvalue, TRUE AS orthonormal
      |FROM range(4) t(i) ORDER BY component""".stripMargin

  // ------------------------------------------- exact z-score anomalies

  /** Hourly anomaly detection with EXACT integer arithmetic: an hour is
    * anomalous when its total deviates from the per-type mean by more
    * than 3σ. The float-free trick: with S=Σx, SS=Σx² and n hours,
    * z² > 9  ⇔  (x·n − S)² > 9·(SS·n − S²) — both sides are integers
    * (decimal(38,0) in Spark, int128 in DuckDB), so the decision is
    * bit-identical across engines with no sqrt/stddev drift.
    *
    * Scale shape: one hash agg over events (corpus-sized), one tiny agg
    * over the hourly series, broadcast of 5 (S, SS, n) rows back onto
    * the series — no second pass over events. */
  private def tsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import graft.QueryDsl._
    val ev = Tables(spark, dir).events
    val byHour = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(sl2(col("value"))).as("x"))
    val stats = byHour.groupBy(col("event_type"))
      .agg(sum(col("x")).as("s"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("ss"),
        count(lit(1)).as("n"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    byHour.join(broadcast(stats), "event_type")
      .withColumn("lhs",
        (dec(col("x")) * col("n") - col("s")) *
          (dec(col("x")) * col("n") - col("s")))
      .withColumn("rhs",
        lit(9) * (dec(col("ss")) * col("n") - dec(col("s")) * col("s")))
      .filter(col("lhs") > col("rhs"))
      .select(col("event_type"), col("h"), col("x").as("total_c"))
      .orderBy(col("event_type"), col("h"))
  }

  private val tsAnomalySql =
    """WITH byh AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, SUM(x) AS s,
      |         SUM(CAST(x AS HUGEINT) * x) AS ss, COUNT(*) AS n
      |       FROM byh GROUP BY 1)
      |SELECT b.event_type, b.h, b.x AS total_c
      |FROM byh b JOIN st USING (event_type)
      |WHERE (CAST(b.x AS HUGEINT) * n - s) * (CAST(b.x AS HUGEINT) * n - s)
      |      > 9 * (CAST(ss AS HUGEINT) * n - CAST(s AS HUGEINT) * s)
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------- event transitions

  /** First-order event-sequence transition matrix per user stream: counts
    * of consecutive (prev_type → next_type) pairs ordered by event time —
    * the base statistic for session flow / Markov-chain analyses. One
    * shuffle on user_id (the lag window), one hash agg on the 25 pair
    * keys. Ties in ts are broken by event_id so the sequence is total
    * and engine-independent. */
  private def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  private val eventTransitionsSql =
    """SELECT prev_type, event_type AS next_type, COUNT(*) AS n FROM (
      |  SELECT user_id, event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events) t
      |WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type
      |ORDER BY prev_type, next_type""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("dedup_sentences", dedupSentences, Some(dedupSentencesSql)),
    QueryDef("ts_gapfill", tsGapfill, Some(tsGapfillSql)),
    QueryDef("embed_scalar_quant", embedScalarQuant, Some(embedScalarQuantSql)),
    QueryDef("embed_pca", embedPca, Some(embedPcaSql)),
    QueryDef("ts_anomaly", tsAnomaly, Some(tsAnomalySql)),
    QueryDef("event_transitions", eventTransitions, Some(eventTransitionsSql)),
  )
}
