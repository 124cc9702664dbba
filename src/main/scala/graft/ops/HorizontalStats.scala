package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * A10: horizontal statistics over the positive cells of a fixed column list
 * (reference `get_stats`, `run.py:207-234`): per row, over the columns whose
 * value > 0 — mean, median, max, min, std, sem, skew, var, five amplitudes,
 * five max/min ratios; everything null-coalesced to 0 at the end
 * (`df.fillna(0)`).
 *
 * Reference bug, preserved behind `bugCompat`: `get_stats` closes over the
 * OUTER `mcc_freq` frame, so all ten call sites describe `mcc_freq`
 * regardless of which family they claim to describe (SURVEY.md §2.4 A10).
 * Callers choose: `bugCompat = true` feeds the mcc_freq columns; `false`
 * feeds the family's own columns (the evident intent).
 *
 * Implementation: array higher-order functions (`filter`, `aggregate`,
 * `array_sort`) — one pass per moment, zero shuffles, row-local. A fused
 * custom Expression would save the repeated array traversals but these rows
 * are one-per-user aggregates (not event-scale), so the win is negligible.
 *
 * Statistic conventions match pandas row-stats: ddof=1 for std/var/sem,
 * bias-corrected G1 skew = n*sqrt(n-1)*m3 / ((n-2)*m2^1.5) with m2,m3 the
 * CENTRAL SUMS Σ(x-mean)^k; n<2 → null std/var/sem, n<3 or m2=0 → null skew.
 */
object HorizontalStats {

  val statNames: Seq[String] = Seq(
    "mean", "median", "max", "min", "std", "sem", "skew", "var",
    "amplitude1", "amplitude2", "amplitude3", "amplitude4", "amplitude5",
    "divmm1", "divmm2", "divmm3", "divmm4", "divmm5")

  /** The 18 stat columns, named `<prefix>_<stat>`, computed over the
    * positive cells of `cols`. */
  def statCols(cols: Seq[String], prefix: String): Seq[Column] = {
    val arr = array_sort(filter(
      array(cols.map(c => col(c).cast("double")): _*), x => x > lit(0.0)))
    val n = size(arr)
    val nd = n.cast("double")
    val mean = when(n > 0, aggregate(arr, lit(0.0), (a, x) => a + x) / nd)
    // element_at needs an int index; (n+1)/2 on int columns is a double
    val median = when(n > 0,
      when(n % 2 === 1, element_at(arr, ((n + lit(1)) / 2).cast("int")))
        .otherwise((element_at(arr, (n / 2).cast("int"))
          + element_at(arr, (n / 2).cast("int") + lit(1))) / 2))
    val mx = when(n > 0, element_at(arr, n))
    val mn = when(n > 0, element_at(arr, lit(1)))
    val m2 = aggregate(arr, lit(0.0), (a, x) => a + pow(x - mean, 2))
    val m3 = aggregate(arr, lit(0.0), (a, x) => a + pow(x - mean, 3))
    val variance = when(n >= 2, m2 / (nd - 1))
    val std = sqrt(variance)
    val sem = std / sqrt(nd)
    val skew = when(n >= 3 && m2 > 0,
      nd * sqrt(nd - 1) * m3 / ((nd - 2) * pow(m2, 1.5)))
    val raw: Seq[Column] = Seq(
      mean, median, mx, mn, std, sem, skew, variance,
      mx - mn, mx - median, mx - mean, median - mn, mean - mn,
      mx / mn, mx / mean, mx / median, mean / mn, median / mn)
    raw.zip(statNames).map { case (c, s) =>
      coalesce(c, lit(0.0)).as(s"${prefix}_$s")
    }
  }

  /** Append the stat family for `statCols` of `srcCols` to `df`
    * (one `get_stats` call site, e.g. `run.py:254`).
    *
    * `bugCompat = true` reproduces the reference closure bug bit-for-bit:
    * the stats keep the FAMILY's prefix but are computed over
    * `closureCols` — the outer `mcc_freq` frame every reference call site
    * actually closes over (`run.py:207-234`) — instead of `srcCols`.
    * `bugCompat = false` computes what the call site evidently intended. */
  def withStats(df: DataFrame, srcCols: Seq[String], prefix: String,
                bugCompat: Boolean = false,
                closureCols: Seq[String] = Nil): DataFrame = {
    val src = if (bugCompat) {
      require(closureCols.nonEmpty,
        "bugCompat = true needs the closed-over column list (the outer " +
          "mcc_freq frame of run.py:207-234)")
      closureCols
    } else srcCols
    df.select(col("*") +: statCols(src, prefix): _*)
  }
}
