package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * Lexical relevance scoring and rank fusion — the retrieval half of a
 * training-data pipeline (mining documents for a topic, building seed sets,
 * fusing lexical and embedding rankings before human review).
 *
 * BM25 here is the Lucene/Okapi form (Robertson et al., TREC-3; the +1 idf
 * shift is Lucene's non-negative variant). Everything is a projection over
 * one corpus-stats row, so the scan stays in whole-stage codegen and the
 * only data movement is a 1-row broadcast — the 100 TB shape: corpus stats
 * are an aggregate, scoring is map-side.
 */
object Relevance {

  /** BM25 score of every document against a fixed bag of query `terms`.
    *
    * Corpus statistics (N, avgdl, per-term document frequency) come from ONE
    * global aggregation producing a single row that broadcasts to the
    * scoring projection — no per-term join, no explode. Per-document term
    * frequencies are array filters over the token projection (integers, so
    * the only floating-point is the final score formula → round(6) makes it
    * cross-engine replayable).
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val toks = TextOps.tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("_w"), x => x === lit(t))).cast("double").as(s"_tf$i")
    }
    val withToks = df
      .withColumn("_w", toks)
      .withColumn("_n", size(col("_w")).cast("double"))
    val perDoc = withToks.select(col(idCol) +: col("_n") +: tfCols: _*)
    // "_ndocs", not "_N": Spark resolution is case-insensitive by default,
    // so an "_N" stats column is ambiguous against the per-doc "_n"
    val statAggs = count(lit(1)).cast("double").as("_ndocs") +:
      avg(col("_n")).as("_avgdl") +:
      terms.indices.map(i =>
        sum((col(s"_tf$i") > 0).cast("long")).cast("double").as(s"_df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i")
      val idf = log(lit(1.0) +
        (col("_ndocs") - col(s"_df$i") + 0.5) / (col(s"_df$i") + 0.5))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_n") / col("_avgdl")))
    }.reduce(_ + _)
    scored.select(col(idCol), col("_n").cast("long").as("n_tokens"),
      round(score, 6).as("bm25"))
  }

  /** Global top-`k` of `df` by (`scoreCol` desc, `idCol` asc), with a dense
    * 1-based `rank` column. The sort+limit is Spark's TakeOrdered (per
    * partition top-k, then a k-row merge on the driver-side exchange) — no
    * global sort of the corpus; the row_number window then runs on k rows.
    * This is the only sane shape for "rank the corpus" at scale: a global
    * rank over every row is a single-partition window by construction, so
    * rank only what you keep. */
  def topKRanks(df: DataFrame, scoreCol: String, idCol: String, k: Int)
  : DataFrame = {
    val ord = Seq(col(scoreCol).desc, col(idCol).asc)
    df.orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): each input list
    * contributes 1/(kRrf + rank) per id; ids missing from a list contribute
    * nothing. Input lists are (idCol, rankCol) — typically [[topKRanks]]
    * outputs, so each is k rows and the fusion aggregate is k·|lists| rows
    * total regardless of corpus size. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no lists")
    lists.map(_.select(col(idCol),
        (lit(1.0) / (lit(kRrf.toDouble) + col(rankCol))).as("_c")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(round(sum(col("_c")), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
  }
}
