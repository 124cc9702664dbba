package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * A6/A7/A8 + W6/W7: adversarial-defense value/key repair
 * (reference `run.py:25-79`).
 *
 * Reference semantics, decomposed relationally (the reference runs an
 * O(users) Python loop with nested per-row scans; here it is one
 * groupBy(user, code) + one groupBy(user) + two joins back — two shuffles on
 * keys the rest of the pipeline already partitions by):
 *
 *  - per (user, code): count; codes with count > nMcc are "frequent" (A6);
 *  - per frequent (user, code), from the ORIGINAL amounts (the loop
 *    snapshots `amt_f_mcc` before mutating): p = min(100, 100*nAmt/count)
 *    percentile bounds lo = P(p), hi = P(100-p), and the median (A7);
 *  - per user: modal code = argmax of count over ALL codes, numpy tie order
 *    = first in sorted-unique order = smallest code (A8), and the median
 *    amount of that modal code;
 *  - W6: rows of frequent codes with amt > hi or amt < lo get the group
 *    median;
 *  - W7: rows of rare codes (count <= nMcc) get (modal code, modal median).
 *
 * `np.percentile` is exact linear interpolation; the percentile fraction
 * varies per group, and Spark's `percentile` needs a foldable fraction, so
 * we interpolate over the group's sorted amounts ourselves
 * (`Repair.interpPercentile`). Group = one user's rows for one code —
 * bounded size, so the collected array is small regardless of total data
 * scale.
 */
object Repair {

  /** Exact linear-interpolated percentile (np.percentile / quantile_cont
    * semantics) over a pre-sorted array, fraction in [0,1]. */
  def interpPercentile(sortedArr: Column, frac: Column): Column = {
    val n = size(sortedArr)
    val idx = frac * (n.cast("double") - 1) // 0-based fractional rank
    val lo = floor(idx).cast("int")
    val hi = ceil(idx).cast("int")
    val vLo = element_at(sortedArr, lo + 1)
    val vHi = element_at(sortedArr, hi + 1)
    when(n === 0, lit(null)).otherwise(vLo + (idx - lo.cast("double")) * (vHi - vLo))
  }

  /** Per-(user, code) stats frame: cnt, lo, hi, med (A6/A7).
    *
    * `exact = true` (default, oracle parity) buffers each group's sorted
    * amounts — memory bound = the largest single (user, code) group, fine
    * for per-entity event data. For corpora with monster heavy-hitter
    * groups set `exact = false`: `approx_percentile` keeps a bounded
    * sketch per group instead of the full array (np.percentile parity is
    * then approximate — do NOT use on oracle-checked paths, SURVEY §4.3). */
  def groupBounds(df: DataFrame, user: String, code: String, amt: String,
                  nAmt: Int, exact: Boolean = true): DataFrame = {
    val cnt = count(lit(1))
    val base = df.groupBy(col(user), col(code))
    if (exact) {
      val sorted = array_sort(collect_list(col(amt).cast("double")))
      base.agg(cnt.as("_cnt"), sorted.as("_sorted"))
        .withColumn("_p", least(lit(1.0), lit(nAmt.toDouble) / col("_cnt")))
        .withColumn("_lo", interpPercentile(col("_sorted"), col("_p")))
        .withColumn("_hi",
          interpPercentile(col("_sorted"), lit(1.0) - col("_p")))
        .withColumn("_med", interpPercentile(col("_sorted"), lit(0.5)))
        .drop("_sorted", "_p")
    } else {
      // approx_percentile needs a foldable fraction; the per-group p is
      // data-dependent, so bound it by the worst case (p <= nAmt/(nMcc+1)
      // whenever the group survives the frequency cutoff) and take the
      // sketch at a fixed grid, interpolating between grid points.
      val acc = lit(10000)
      val v = col(amt).cast("double")
      val grid = (0 to 100).map(_ / 100.0)
      base.agg(cnt.as("_cnt"),
          percentile_approx(v, array(grid.map(lit): _*), acc).as("_q"))
        .withColumn("_p", least(lit(1.0), lit(nAmt.toDouble) / col("_cnt")))
        .withColumn("_lo", element_at(col("_q"),
          (round(col("_p") * 100, 0)).cast("int") + 1))
        .withColumn("_hi", element_at(col("_q"),
          (round((lit(1.0) - col("_p")) * 100, 0)).cast("int") + 1))
        .withColumn("_med", element_at(col("_q"), lit(51)))
        .drop("_q", "_p")
    }
  }

  /** Per-user modal code (+ its median amount): A8, numpy tie order — among
    * max-count codes take the SMALLEST (np.unique returns codes sorted, and
    * argmax picks the first maximum). */
  def modal(bounds: DataFrame, user: String, code: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy(col(user))
    bounds
      .withColumn("_mx", max(col("_cnt")).over(byUser))
      .filter(col("_cnt") === col("_mx"))
      .groupBy(col(user))
      .agg(min(col(code)).as("_modal_code"),
        min_by(col("_med"), col(code)).as("_modal_med"))
  }

  /** Full W6+W7 repair: returns `df` with `code` and `amt` replaced by their
    * repaired values (same column names). `exact = false` switches the
    * percentile stage to bounded-memory sketches (see groupBounds). */
  def apply(df: DataFrame, user: String, code: String, amt: String,
            nAmt: Int = 10, nMcc: Int = 10, exact: Boolean = true): DataFrame = {
    val bounds = groupBounds(df, user, code, amt, nAmt, exact)
    val modals = modal(bounds, user, code)
    val passthrough = df.columns.filterNot(c => c == code || c == amt).map(col).toSeq
    df.join(bounds, Seq(user, code), "left")
      .join(modals, Seq(user), "left")
      .select(passthrough ++ Seq(
        when(col("_cnt") > nMcc, col(code)).otherwise(col("_modal_code")).as(code),
        when(col("_cnt") > nMcc,
          when(col(amt) > col("_hi") || col(amt) < col("_lo"), col("_med"))
            .otherwise(col(amt)))
          .otherwise(col("_modal_med")).as(amt)): _*)
  }
}
