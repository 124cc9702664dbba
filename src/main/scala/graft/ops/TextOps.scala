package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * Text-analysis operators for a large-scale training-data pipeline:
 * tokenization, shingling, quality scoring, language ID, fingerprinting.
 *
 * These go beyond the reference's own surface (its only string handling is
 * column-name formatting) — they are the capability layer a 100 TB document
 * corpus needs. Everything here is a pure projection (`Column` functions over
 * built-ins), so it stays inside whole-stage codegen with zero shuffles and
 * scales linearly with the scan.
 */
object TextOps {

  /** Word tokens: maximal [a-z0-9]+ runs of the lowercased text. Regex-based
    * (not split-on-space) so repeated/edge whitespace can't produce empty
    * tokens — and the same regex is expressible in the DuckDB oracle. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Word n-gram shingles (space-joined) over the token array; documents with
    * fewer than `n` tokens yield an empty set. Character shingles are too
    * dense for natural text (every doc shares them); word shingles keep the
    * per-shingle posting lists short, which is what bounds the dedup
    * shingle-join at scale. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Canonical-form fingerprint: lowercase, non-alphanumerics collapsed to
    * single spaces, trimmed, then md5 — robust to whitespace/punctuation
    * edits, O(len) per row, join-key-sized (16 bytes) for exact dedup at any
    * scale. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Stopword hit count over the token array (integer — exact cross-engine). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*).cast("boolean")))

  /** Per-language stopword lists for the heuristic language ID. Tiny
    * closed-world lists (reference-style fixed vocabularies, §1.4): the
    * point is the operator shape — score per language, argmax with a fixed
    * preference order — not lexicographic coverage. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "no"))

  /** Heuristic language ID: stopword-hit score per language; winner must be
    * strictly positive, ties broken by list order; otherwise "und". */
  def langId(toks: Column): Column = {
    val scores = langStopwords.map { case (l, sw) => l -> stopwordHits(toks, sw) }
    // first language (in list order) whose score is >= all others and > 0
    val candidates = scores.map { case (l, s) =>
      val beatsAll = scores.collect { case (o, os) if o != l => s >= os }
        .reduce(_ && _)
      when(s > 0 && beatsAll, lit(l))
    }
    coalesce(candidates :+ lit("und"): _*)
  }

  /** Quality-scoring feature bundle (length, digit ratio, stopword ratio,
    * mean token length, type/token ratio) + a fixed linear score. All ratios
    * are integer/integer divisions — exact cross-engine. */
  def qualityCols(text: Column, toks: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val nToks = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val tokChars = aggregate(transform(toks, t => length(t)), lit(0),
      (a, x) => a + x)
    val nDigits = size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("long")
    val stop = stopwordHits(toks, langStopwords.flatMap(_._2)).cast("long")
    val nToksD = nToks.cast("double")
    val meanTokLen = when(nToks > 0, tokChars.cast("double") / nToksD).otherwise(lit(0.0))
    val stopRatio = when(nToks > 0, stop.cast("double") / nToksD).otherwise(lit(0.0))
    val ttr = when(nToks > 0, nDistinct.cast("double") / nToksD).otherwise(lit(0.0))
    val digitRatio = when(nChars > 0, nDigits.cast("double") / nChars.cast("double"))
      .otherwise(lit(0.0))
    val score = round(
      lit(0.35) * ttr + lit(0.35) * stopRatio
        + lit(0.2) * (lit(1.0) - digitRatio)
        + lit(0.1) * least(meanTokLen / lit(10.0), lit(1.0)), 6)
    Seq(nChars.as("n_chars_calc"), nToks.as("n_tokens"),
      nDistinct.as("n_distinct_tokens"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(ttr, 6).as("type_token_ratio"),
      round(digitRatio, 6).as("digit_ratio"),
      score.as("quality_score"))
  }

  /** Token count via whitespace split and via the token regex — the two
    * "token counting" conventions (SURVEY-plus scope), both exact ints. */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens_regex", size(tokens(t)).cast("long"))
      .withColumn("n_tokens_ws",
        size(filter(split(t, " "), x => length(x) > 0)).cast("long"))
      .withColumn("n_distinct_tokens",
        size(array_distinct(tokens(t))).cast("long"))
  }
}
