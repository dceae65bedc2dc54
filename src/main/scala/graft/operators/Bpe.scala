package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction — the core loop of tokenizer
  * training (Sennrich et al. 2016), distributed: the corpus is reduced
  * once to a (distinct word, frequency) vocabulary, each round counts
  * weighted adjacent symbol pairs over that vocabulary, picks the global
  * argmax pair (count desc, then lexicographic — fully deterministic) and
  * rewrites the vocabulary by merging that pair everywhere.
  *
  * Representation: a word's symbol sequence is a `|`-delimited string
  * (`"abc"` → `"|a|b|c|"`), so the per-round merge is a plain substring
  * replace `"|l|r|"` → `"|lr|"` — left-to-right non-overlapping in both
  * Spark and DuckDB, which is exactly BPE's merge convention. Pair
  * counting is over all adjacent positions (overlapping, the standard
  * count) weighted by word frequency.
  *
  * 100 TB story: the only corpus-sized pass is the initial word count
  * (map-side combinable). Every round then works on the distinct-word
  * vocabulary (millions of rows at web scale, not billions), one hash
  * aggregation each, and the chosen pair is a one-row collect broadcast
  * into a narrow map — the same shape production tokenizer trainers
  * distribute. No end-of-word marker (documented simplification; adding
  * one is a representation change only).
  */
object Bpe {

  /** `rounds` BPE merges over `textCol` (whitespace-tokenized).
    * @return one row per round: (round, left, right, cnt) */
  def merges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    // the ONLY corpus-sized pass; everything after works on distinct words
    val vocab0 = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(concat(lit("|"),
        regexp_replace(col("w"), "(.)", "$1|")).as("r"), col("f"))
      .persist()
    var vocab = vocab0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      for (i <- 1 to rounds) {
        val best: Array[Row] = vocab
          .selectExpr("split(trim(BOTH '|' FROM r), '\\\\|') AS syms", "f")
          .where("size(syms) >= 2")
          .selectExpr("f",
            """explode(transform(sequence(0, size(syms) - 2),
              |  j -> struct(syms[j] AS l, syms[j + 1] AS rr))) AS p"""
              .stripMargin)
          .groupBy(col("p.l").as("l"), col("p.rr").as("rr"))
          .agg(sum(col("f")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("rr"))
          .limit(1).collect()
        if (best.isEmpty) return result(spark, out.toSeq) // vocab exhausted
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((i, l, r, cnt))
        // merge everywhere: narrow map over the vocabulary
        vocab = vocab.withColumn("r",
          expr(s"replace(r, '|$l|$r|', '|$l$r|')"))
      }
      result(spark, out.toSeq)
    } finally vocab0.unpersist()
  }

  private def result(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("round", "lhs", "rhs", "cnt")
  }

  /** Apply an ordered merge list (the output of [[merges]]) to text —
    * the tokenizer's ENCODE side: per document, the token count after
    * every merge has been applied left-to-right (the same
    * delimiter-bounded replace as training, so encode ∘ train is
    * self-consistent). Map-only, pure codegen'd string functions — the
    * merge list is tiny and lives in the plan as literals, so at 100 TB
    * this is a single narrow pass with nothing to shuffle. */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      mergeList: Seq[(String, String)]): DataFrame = {
    def q(s: String): String = s.replace("'", "''")
    val rep = "concat('|', regexp_replace(w, '(.)', '$1|'))"
    val chained = mergeList.foldLeft(rep) { case (e, (l, r)) =>
      s"replace($e, '|${q(l)}|${q(r)}|', '|${q(l)}${q(r)}|')"
    }
    docs.selectExpr(idCol,
      s"""CAST(size(filter(split($textCol, ' '), w -> w <> '')) AS BIGINT)
         |  AS n_words""".stripMargin,
      s"""aggregate(
         |  transform(filter(split($textCol, ' '), w -> w <> ''),
         |    w -> size(split(trim(BOTH '|' FROM $chained), '\\\\|'))),
         |  0L, (a, x) -> a + CAST(x AS BIGINT)) AS n_tokens""".stripMargin)
  }
}
