package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact per-group quantiles WITHOUT buffering groups: `Repair
 * .interpPercentile` collects each group's sorted array (right for
 * per-entity groups, wrong for corpus-wide ones) and q44's histogram is
 * approximate. This is the third point of the trade: EXACT np.percentile /
 * quantile_cont semantics with state bounded by DISTINCT values per group,
 * not rows.
 *
 * Boundedness caveat: "distinct values" is the operative bound — right
 * for prices, counts, scores and anything quantized (money data here is
 * 2-dp), wrong for raw continuous measurements where distinct ≈ rows;
 * there, pre-round the value to the precision the quantile actually
 * needs, or accept q44's sketch. The per-group window sorts one group's
 * distinct values in one task, so that bound is also the task bound —
 * and it is ENFORCED, not just documented: `maxDistinctPerGroup`
 * (default 4M ≈ tens of MB of (value, count) state per task) fails the
 * job with a named-group error instead of letting a raw-continuous
 * misuse OOM an executor mid-sort at 100 TB. The check rides the
 * target-rank aggregation the plan already does (count(*) over the
 * distinct-value table per group — no extra shuffle).
 *
 * Shape: one aggregation to (group, value, multiplicity), a window over
 * the DISTINCT-value table only (the d31 trick — never a row-level
 * per-group window, whose single task would take a whole group), then a
 * broadcast range-join of the quantile target ranks against the cumulative
 * intervals. The k-th sorted element (duplicates counted) is the distinct
 * value whose cumulative interval covers rank k — selection is integer
 * rank arithmetic, so both elements of the interpolation are exact and the
 * final lerp is the only float, identical to the DuckDB oracle's
 * sorted-list formula.
 */
object Quantiles {

  /** (grp, frac, q): exact linear-interpolated quantile of `v` per group,
    * for each fraction in `fracs` (np.percentile semantics). Fails fast
    * (SparkException naming the group) if any group exceeds
    * `maxDistinctPerGroup` distinct values — the state bound this
    * operator's exactness rests on. */
  def exactGroupQuantiles(df: DataFrame, grp: Column, v: Column,
                          fracs: Seq[Double],
                          maxDistinctPerGroup: Long = 4000000L): DataFrame = {
    require(fracs.nonEmpty && fracs.forall(f => f >= 0 && f <= 1))
    require(maxDistinctPerGroup > 0, "maxDistinctPerGroup must be positive")
    val dv = df.select(grp.as("grp"), v.as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
    // 1-based rank interval [lo_r, hi_r] this distinct value occupies in
    // the group's sorted multiset
    val cum = dv.withColumn("_hi_r", sum(col("_c")).over(w))
      .withColumn("_lo_r", col("_hi_r") - col("_c") + 1)
    // _ndv rides the aggregation the targets need anyway; assert_true
    // raises per offending group BEFORE the broadcast range-join consumes
    // the targets (the window sort may run concurrently, but the job
    // fails at this cheap aggregate instead of grinding to completion)
    val guardMsg = concat(
      lit("exactGroupQuantiles: group "), col("grp").cast("string"),
      lit(" has "), col("_ndv").cast("string"),
      lit(s" distinct values (> maxDistinctPerGroup=$maxDistinctPerGroup);"),
      lit(" pre-round the value or use Histogram.quantiles"))
    val targets = dv.groupBy(col("grp"))
      .agg(sum(col("_c")).as("_cnt"), count(lit(1)).as("_ndv"))
      .filter(assert_true(
        col("_ndv") <= lit(maxDistinctPerGroup), guardMsg).isNull)
      .select(col("grp").as("_tg"), col("_cnt"),
        explode(array(fracs.map(lit): _*)).as("frac"))
      .withColumn("_idx", col("frac") * (col("_cnt").cast("double") - 1))
      .withColumn("_lo", floor(col("_idx")).cast("long") + 1)
      .withColumn("_hi", ceil(col("_idx")).cast("long") + 1)
    def pick(rank: Column, as: String): DataFrame = cum
      .join(broadcast(targets), col("grp") === col("_tg")
        && rank.between(col("_lo_r"), col("_hi_r")))
      .select(col("grp"), col("frac"), col("_idx"), col("v").as(as))
    pick(col("_lo"), "_vlo")
      .join(pick(col("_hi"), "_vhi"), Seq("grp", "frac", "_idx"))
      .select(col("grp"), col("frac"),
        (col("_vlo") + (col("_idx") - floor(col("_idx")))
          * (col("_vhi") - col("_vlo"))).as("q"))
  }
}
