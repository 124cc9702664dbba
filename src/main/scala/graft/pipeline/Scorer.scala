package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * Pluggable scoring stage (SURVEY.md §7.5): the reference's torch GRU/VRAE
 * and CatBoost scorers are out of relational scope — capability parity is
 * "a DataFrame-in, DataFrame-out stage that appends a score column". A
 * production deployment plugs a Spark ML model (e.g. GBTClassifier as the
 * CatBoost analog) or an inference UDF behind this trait; the pipeline shape
 * is unchanged.
 */
trait Scorer {
  /** Append a `target` score column to the feature matrix. */
  def score(features: DataFrame): DataFrame
}

/** Deterministic linear scorer — codegen-friendly (pure projection) and
  * reproducible across engines, which makes the full-pipeline oracle
  * checkable end to end. */
case class LinearScorer(weights: Map[String, Double], bias: Double = 0.0,
                        roundTo: Int = 6) extends Scorer {
  override def score(features: DataFrame): DataFrame = {
    val combo = weights.toSeq.sortBy(_._1)
      .map { case (c, w) => col(c) * lit(w) }
      .foldLeft(lit(bias))(_ + _)
    features.withColumn("target", round(combo, roundTo))
  }
}
