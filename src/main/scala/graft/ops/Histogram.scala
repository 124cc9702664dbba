package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.micros // integer-micros cross-engine fixed-point

/**
 * Histogram-sketch quantiles: the bounded-state percentile shape that
 * survives 100 TB. The exact per-group percentile (`Repair.scala`,
 * collect_list + array_sort) buffers whole groups; this sketch holds
 * exactly `bins` integer counters per group no matter how many rows the
 * group has, and both passes are plain aggregations with map-side combine.
 *
 * Two passes: (1) global [min, max] — a 1-row aggregate broadcast to the
 * binning projection; (2) per-(group, bin) counts. The quantile is then a
 * linear interpolation inside the first bin whose cumulative count reaches
 * q·n — integer counts + one fixed double expression, so the DuckDB oracle
 * replays it bit-for-bit. The published estimate is an INTEGER:
 * `est_micros BIGINT = floor(est * 1e6)` (CrossRound.micros). Earlier
 * rounds published a truncated double (`floor(est*1e6)/1e6`) and the
 * value was verifiably grid-identical across engines, yet a double column
 * is still hashed AS a double — one rendering ulp anywhere in the
 * verify chain breaks the comparison. Integers hash identically on every
 * engine and every DuckDB version; no ulp can survive `floor`.
 */
object Histogram {

  /** Per-group quantile estimates of `value` at each q in `qs` from a
    * fixed-`bins` histogram over the GLOBAL value range. Returns one row
    * per (group, q): (grp, q, n, est_micros) where est_micros is the
    * estimate in integer micros. Deterministic by construction — bin ids
    * are floor arithmetic, counts are ints, ties broken by bin id. */
  def quantiles(df: DataFrame, group: Column, value: Column, bins: Int,
                qs: Seq[Double]): DataFrame = {
    require(bins > 0 && qs.nonEmpty, "histQuantiles: bins and qs required")
    val v = value.cast("double")
    val stats = df.agg(min(v).as("_lo"), max(v).as("_hi"))
    val width = (col("_hi") - col("_lo")) / bins
    // degenerate range (all values equal) → everything in bin 0;
    // v == max lands in the last bin, not a phantom bins-th one.
    // References "_v" (the post-select name), not the caller's column —
    // the binning runs after the (grp, _v) projection.
    val bin = when(col("_hi") === col("_lo"), lit(0))
      .otherwise(least(lit(bins - 1),
        floor((col("_v") - col("_lo")) / width).cast("int")))
    val counts = df.select(group.as("grp"), v.as("_v"))
      .crossJoin(broadcast(stats))
      .groupBy(col("grp"), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"), first(col("_lo")).as("_lo"),
        first(col("_hi")).as("_hi"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    // one row per (group, occupied bin, q); the first covering bin wins
    val qArr = explode(array(qs.map(lit): _*)).as("q")
    val target = col("q") * col("n").cast("double")
    val wPick = Window.partitionBy(col("grp"), col("q"))
      .orderBy(col("bin"))
    val est = col("_lo") + (col("_hi") - col("_lo")) / bins *
      (col("bin").cast("double") +
        (target - (col("cum") - col("cnt")).cast("double")) /
          col("cnt").cast("double"))
    cum.select(col("grp"), col("bin"), col("cnt"), col("cum"), col("n"),
        col("_lo"), col("_hi"), qArr)
      .filter(col("cum").cast("double") >= target)
      .withColumn("_rn", row_number().over(wPick))
      .filter(col("_rn") === 1)
      // clamp: target below the first covering bin's start (q·n smaller
      // than everything before it can only happen for the group's first
      // occupied bin) still interpolates within that bin, floor at _lo
      .select(col("grp"), col("q"), col("n"),
        micros(greatest(col("_lo"), least(col("_hi"), est))).as("est_micros"))
  }
}
