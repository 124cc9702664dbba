package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/**
 * Cross-engine deterministic rounding for double outputs.
 *
 * Spark's `round(x, n)` rounds the DECIMAL EXPANSION of the double
 * (BigDecimal HALF_UP); DuckDB's `round` on DOUBLE computes
 * `round(x * 10^n) / 10^n` with the multiply in double arithmetic. When
 * the true value sits exactly on the half grid — common with
 * ratio-valued features (k/32-style rationals) and 2-decimal money data —
 * the two conventions disagree by one output ulp even though BOTH engines
 * computed the identical input double (measured: quality_score
 * 0.5365625 → Spark .536562, DuckDB .536563 at sf0.1).
 *
 * This helper computes the MULTIPLY FORM on the Spark side. Every step is
 * then IEEE-identical to DuckDB's: the `x * 10^n` product is the same
 * double, and 0-dp rounding of a double agrees between Spark (BigDecimal
 * of the value, HALF_UP) and C `round()` (half away from zero) for every
 * finite double — a tie needs the double to be exactly k+0.5, and both
 * rules send it away from zero.
 *
 * Import `CrossRound.round` AFTER `functions._` — the explicit import
 * shadows the wildcard, so existing `round(c, n)` call sites pick up the
 * deterministic form with no other change.
 */
object CrossRound {
  def round(c: Column, scale: Int): Column =
    if (scale == 0) F.round(c)
    else {
      val p = F.lit(math.pow(10, scale))
      F.round(c * p) / p
    }

  /**
   * Negative-zero-normalized cross-engine round: `round(x, scale) + 0.0`.
   *
   * A second residual failure mode of the multiply form, hit by q87's
   * full-sequence cumulative z-sum (r11): when the true value is ~0 with a
   * tiny NEGATIVE residual (sum of z-scores over a complete group is
   * mathematically 0, numerically ≈ -1e-13), DuckDB's `round(x, 6)`
   * preserves the sign and lands on `-0.0` while Spark's multiply-form
   * round lands on `+0.0` — numerically equal (`-0.0 == 0.0`), but a
   * byte-level hash of the doubles differs. IEEE 754 defines
   * `-0.0 + 0.0 = +0.0`, so appending `+ 0.0` AFTER the round collapses
   * both engines onto positive zero while leaving every non-zero grid
   * point untouched. The oracle SQL must append the same `+ 0.0`.
   *
   * Use for any rounded column whose value can be an exact cancellation
   * (cumulative sums of centered quantities, differences of equal terms).
   */
  def roundNz(c: Column, scale: Int): Column = round(c, scale) + F.lit(0.0)

  /**
   * Tie-FREE cross-engine fixed-point: `floor(x * 10^scale) / 10^scale`.
   *
   * The multiply form above still has one residual failure mode: when
   * `x * 10^n` lands within half an output ulp of the rounding grid at
   * large magnitude (ulp(2.4e8 * 1e6) ≈ 3e-8 — well above the grid
   * resolution), Spark's BigDecimal.valueOf shortest-string semantics and
   * C `round()` can disagree on which side of the half the value sits.
   * `floor` has no half to disagree about: it is exact on every finite
   * double and identical in IEEE 754, Spark, DuckDB, and C. Use this for
   * sketch/interpolation estimates where the value is a computed double
   * (not a decimal-natured ratio) and any fixed grid point is acceptable.
   *
   * Spark's `floor` returns LONG, so `|x| * 10^scale` must stay below
   * 2^63; at scale 6 that is |x| < ~9.2e12 — far above any estimate here.
   */
  def truncate(c: Column, scale: Int): Column = {
    val p = F.lit(math.pow(10, scale))
    F.floor(c * p) / p
  }

  /**
   * Integer-micros fixed point: `floor(x * 1e6)` published as BIGINT.
   *
   * The end state of the cross-engine determinism ladder: `truncate`
   * still divides back to a double, and a double column is hashed by the
   * driver as a double — any engine/version that renders one ulp
   * differently breaks the hash even when the VALUE grid-point is
   * identical. Publishing the scaled integer removes the double from the
   * output entirely: `floor(x * 1e6)` is exact IEEE on both engines and
   * BIGINT hashes identically everywhere. Consumers that want the
   * human-readable value divide at display time.
   */
  def micros(c: Column): Column = F.floor(c * F.lit(1e6))
}
