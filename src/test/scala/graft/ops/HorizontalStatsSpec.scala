package graft.ops

import graft.SparkSpec

/** A10: per-row stats over positive cells — pandas row-stat conventions
  * (ddof=1, G1 skew), zeros excluded, NaN-ish guards coalesced to 0. */
class HorizontalStatsSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, eps: Double = 1e-9) =
    assert(math.abs(a - b) <= eps, s"$a vs $b")

  test("stats over positive cells exclude zeros; n=2 row: skew guards to 0") {
    val df = Seq((1L, 0.0, 5.0, 1.0)).toDF("u", "a", "b", "c")
    val r = HorizontalStats.withStats(df, Seq("a", "b", "c"), "h").head()
    approx(r.getAs[Double]("h_mean"), 3.0)
    approx(r.getAs[Double]("h_median"), 3.0)
    approx(r.getAs[Double]("h_max"), 5.0)
    approx(r.getAs[Double]("h_min"), 1.0)
    approx(r.getAs[Double]("h_var"), 8.0)
    approx(r.getAs[Double]("h_std"), math.sqrt(8.0))
    approx(r.getAs[Double]("h_sem"), 2.0)
    approx(r.getAs[Double]("h_skew"), 0.0) // n<3 → null → 0
    approx(r.getAs[Double]("h_amplitude1"), 4.0)
    approx(r.getAs[Double]("h_divmm1"), 5.0)
    approx(r.getAs[Double]("h_divmm4"), 3.0)
  }

  test("odd-length row: interpolated median is the middle positive cell") {
    val df = Seq((1L, 3.0, 1.0, 2.0)).toDF("u", "a", "b", "c")
    val r = HorizontalStats.withStats(df, Seq("a", "b", "c"), "h").head()
    approx(r.getAs[Double]("h_median"), 2.0)
    // pandas G1 skew of [1,2,3] = 0
    approx(r.getAs[Double]("h_skew"), 0.0)
  }

  test("all-zero row: every stat coalesces to 0") {
    val df = Seq((1L, 0.0, 0.0)).toDF("u", "a", "b")
    val r = HorizontalStats.withStats(df, Seq("a", "b"), "h").head()
    HorizontalStats.statNames.foreach { s =>
      approx(r.getAs[Double](s"h_$s"), 0.0)
    }
  }
}
