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

  test("horizontal stats agree with vertical GroupStats on the same values") {
    // same multiset [2,3,7,9] through both stat engines: A10's per-row
    // array fold and A5's aggregate must produce identical moments
    val row = Seq((1L, 2.0, 3.0, 7.0, 9.0)).toDF("u", "a", "b", "c", "d")
    val h = HorizontalStats.withStats(row, Seq("a", "b", "c", "d"), "h")
      .head()
    val vert = Seq(2.0, 3.0, 7.0, 9.0).map(("g", _)).toDF("g", "v")
    val g = GroupStats.stats(vert, Seq("g"), "v", "s").head()
    for ((hs, gs) <- Seq("mean" -> "mean", "median" -> "median",
      "max" -> "max", "min" -> "min", "std" -> "std", "sem" -> "sem",
      "skew" -> "skew", "var" -> "var")) {
      approx(h.getAs[Double](s"h_$hs"), g.getAs[Double](s"s_$gs"))
    }
  }

  test("all-zero row: every stat coalesces to 0") {
    val df = Seq((1L, 0.0, 0.0)).toDF("u", "a", "b")
    val r = HorizontalStats.withStats(df, Seq("a", "b"), "h").head()
    HorizontalStats.statNames.foreach { s =>
      approx(r.getAs[Double](s"h_$s"), 0.0)
    }
  }

  test("bugCompat describes the closed-over frame, not the named family") {
    // freq frame [1,2,3] vs proc family [10,20,40]: with bugCompat the
    // "proc" stats must equal the FREQ stats (the run.py:207-234 closure
    // bug); without it they describe proc itself
    val df = Seq((1L, 1.0, 2.0, 3.0, 10.0, 20.0, 40.0))
      .toDF("u", "f_a", "f_b", "f_c", "p_a", "p_b", "p_c")
    val freqCols = Seq("f_a", "f_b", "f_c")
    val procCols = Seq("p_a", "p_b", "p_c")
    val bug = HorizontalStats.withStats(df, procCols, "ps",
      bugCompat = true, closureCols = freqCols).head()
    val intent = HorizontalStats.withStats(df, procCols, "ps").head()
    val freqTruth = HorizontalStats.withStats(df, freqCols, "ft").head()
    approx(bug.getAs[Double]("ps_mean"), freqTruth.getAs[Double]("ft_mean"))
    approx(bug.getAs[Double]("ps_max"), 3.0)
    approx(intent.getAs[Double]("ps_mean"), 70.0 / 3)
    approx(intent.getAs[Double]("ps_max"), 40.0)
    intercept[IllegalArgumentException] {
      HorizontalStats.withStats(df, procCols, "ps", bugCompat = true)
    }
  }
}
