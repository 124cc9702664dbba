package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * Distinct-count sketching for corpus-scale cardinality questions
 * ("how many unique users/URLs/tokens per segment?") where an exact
 * `countDistinct` would shuffle every distinct value.
 *
 * KMV (k-minimum-values, Bar-Yossef et al. 2002): per group keep the k
 * smallest hash values of the distinct inputs; with the k-th smallest
 * normalized hash u_k, the estimator is (k−1)/u_k. Standard error
 * ≈ 1/√(k−2) — k=64 gives ~13%, k=1024 ~3%.
 *
 * Determinism: ranking uses the INTEGER 60-bit md5 hash only (exact in any
 * engine — same family as the ANN/bootstrap oracles); floating point enters
 * solely in the final estimate division, rounded cross-engine. Spark's
 * native `approx_count_distinct` (HLL++) is the production alternative but
 * its hash/merge internals are not replayable in an external oracle.
 *
 * Scale shape: one `distinct` on (group, hash) with map-side partial
 * aggregation, then a per-group top-k (window over the hash order — the
 * same exchange the distinct already created, so AQE coalesces to a single
 * shuffle), then a group-local aggregate. Nothing corpus-sized crosses the
 * wire beyond the distinct pass; the k-row-per-group tail is sketch-sized.
 */
object Sketches {

  /** Per-group distinct-count estimate via KMV alongside the exact count
    * (kept for error inspection; a production pipeline would drop it).
    * Output: (grp, n_exact, est_distinct). Groups with fewer than k
    * distinct values are exact by construction (the sketch holds them
    * all). */
  def kmvDistinct(df: DataFrame, group: Column, value: Column,
                  k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // (k-1) * 2^60: both factors and the product are exactly representable
    // doubles for any sane k, so the numerator folds identically everywhere
    val num = (k - 1).toDouble * 1.152921504606846976e18
    val hashed = df
      .select(group.as("grp"), Dedup.md5Hash(value.cast("string"), lit(salt))
        .as("h"))
      .distinct()
    val byHash = Window.partitionBy(col("grp")).orderBy(col("h"))
    val sketch = hashed
      .withColumn("_rn", row_number().over(byHash))
      .filter(col("_rn") <= k)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("_m"), max(col("h")).as("_hk"))
      .select(col("grp"),
        round(when(col("_m") >= k, lit(num) / col("_hk").cast("double"))
          .otherwise(col("_m").cast("double")), 6).as("est_distinct"))
    val exact = df.groupBy(group.as("grp"))
      .agg(countDistinct(value).as("n_exact"))
    exact.join(sketch, Seq("grp"))
  }
}
