package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) so they vectorize inside whole-stage
  * codegen and scale linearly with the corpus.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** English stopword list used for quality + language heuristics
    * (tiny on purpose — the heuristic is the operator, not the lexicon). */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "on")

  def stopwordCount(text: Column,
      words: Seq[String] = EnglishStopwords): Column =
    size(filter(tokens(text), t => t.isin(words: _*))).cast("long")

  /** share of stopwords among tokens — deterministic double division */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text).cast("double")

  /** n-gram heuristic language ID: stopword votes per language. */
  val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> EnglishStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"))

  /** best-vote language; 'und' (undetermined) when no stopword hits.
    * Ties break by language code order (deterministic). */
  def langId(text: Column): Column = {
    val votes = StopwordsByLang.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordCount(text, words).as("votes"), lit(lang).as("lang"))
    }
    val best = aggregate(array(votes: _*),
      struct(lit(-1L).as("votes"), lit("und").as("lang")),
      (acc, v) => when(v.getField("votes") > acc.getField("votes"), v)
        .otherwise(acc))
    when(best.getField("votes") > 0, best.getField("lang")).otherwise("und")
  }

  /** composite quality score in [0,1]: length band + stopword presence +
    * mean token length band (deterministic double tree). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lenOk = when(n >= 10 && n <= 10000, 0.4).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.01, 0.3).otherwise(0.0)
    val meanTok = length(text).cast("double") / n.cast("double")
    val tokOk = when(meanTok >= 3.0 && meanTok <= 12.0, 0.3).otherwise(0.0)
    lenOk + stopOk + tokOk
  }

  /** document fingerprint: md5 of the raw text (content-addressable id). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Overlapping token windows for context-length packing: array of
    * (chunk_id, chunk_text) structs, stride = width − overlap, last
    * partial window kept. Pure column expressions — chunking a 100 TB
    * corpus is a map-only pass. */
  def chunk(text: Column, width: Int, overlap: Int): Column = {
    require(overlap < width, "overlap must be smaller than the width")
    val stride = width - overlap
    val toks = tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      start => struct(
        (start / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(toks, start + 1, lit(width)))
          .as("chunk_text")))
  }

  /** ALL word w-grams in order (non-distinct — occurrence counting; use
    * [[Dedup.shingles]] for the distinct-set variant). Empty for docs
    * shorter than w tokens. */
  def ngrams(text: Column, w: Int): Column = {
    val toks = tokens(text)
    filter(
      transform(sequence(lit(0), greatest(size(toks) - w, lit(0))),
        i => when(i + w <= size(toks),
          concat_ws(" ", slice(toks, i + 1, lit(w))))),
      x => x.isNotNull)
  }

  /** count of distinct word w-shingles (rolling window fingerprint base). */
  def shingleCount(text: Column, w: Int): Column =
    size(Dedup.shingles(text, w)).cast("long")
}
