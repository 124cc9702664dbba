package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * E3 + A13: bootstrap resampling for prediction smoothing
 * (reference `model.py:279-281`: ×50 `df.sample(frac=0.95, replace=True,
 * random_state=seed+i)`, then per-user mean over the runs, `model.py:293`).
 *
 * Spark's with-replacement sample is per-row Poisson — statistically
 * equivalent to pandas' exact-count draw but not row-identical, and fully
 * distributed (no global shuffle, no driver collect). Document, don't fight
 * it (SURVEY.md §2.8 E3).
 */
object Sampling {

  def bootstrap(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = true, fraction, seed)

  /** The ×k ensemble union, tagged by run id; downstream takes
    * groupBy(key).avg (A13). */
  def bootstrapRuns(df: DataFrame, k: Int, fraction: Double, seed: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    (0 until k).map(i => bootstrap(df, fraction, seed + i)
      .withColumn("run_id", lit(i))).reduce(_ unionByName _)
  }
}
