package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Crafted-input checks for the in-engine logistic trainer (d95): the
  * exact gradient-step arithmetic (hand-computed first step), the
  * partition-independence of the decimal-sum gradient, the
  * standardization stats, and that the fit actually separates separable
  * data. The driver's DuckDB oracle replays the full loop at data scale;
  * these pin the math. */
class LearnSpec extends SparkSpec {
  import spark.implicits._

  test("logisticFit: first gradient step matches hand computation") {
    // 4 rows, bias + one feature. From w = 0: z = 0, p = 0.5 exactly,
    // residual y - 0.5 = ±0.5.
    //   g0 = Σ(y-0.5)·1  = (0.5 + 0.5 - 0.5 - 0.5)       = 0.0
    //   g1 = Σ(y-0.5)·x  = 0.5·1 + 0.5·0.8 - 0.5·0.2 - 0.5·0 = 0.8
    // w = round6(0 + lr·g/n): lr=2, n=4 → w0 = 0.0, w1 = 0.4
    val df = Seq((1.0, 1.0), (1.0, 0.8), (0.0, 0.2), (0.0, 0.0))
      .toDF("y", "x1")
    val w = Learn.logisticFit(df, col("y"),
      Seq(lit(1.0), col("x1")), iters = 1, lr = 2.0)
    assert(w.toSeq == Seq(0.0, 0.4))
  }

  test("logisticFit: gradient sum is partition-independent") {
    val rows = (0 until 997).map { i =>
      val x = (i % 89) / 88.0
      (if (x > 0.4) 1.0 else 0.0, x, ((i * 7) % 31) / 30.0)
    }
    val base = rows.toDF("y", "x1", "x2")
    val xs = Seq(lit(1.0), col("x1"), col("x2"))
    val w1 = Learn.logisticFit(base.coalesce(1), col("y"), xs, 5, 4.0)
    val w7 = Learn.logisticFit(base.repartition(7), col("y"), xs, 5, 4.0)
    assert(w1.toSeq == w7.toSeq)
  }

  test("standardStats: exact decimal moments on the 6-dp grid") {
    // x = {1, 2, 3, 4}: μ = 2.5, E[x²] = 7.5, σ = √(7.5-6.25) = √1.25
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val Array((mu, sd)) = Learn.standardStats(df, Seq(col("x")))
    assert(mu == 2.5)
    assert(sd == Learn.round6(math.sqrt(1.25)))
  }

  test("fit separates separable data above the base rate") {
    val rows = (0 until 600).map { i =>
      val x = (i % 100) / 99.0
      (if (x >= 0.3) 1.0 else 0.0, x) // 70% base rate, separable at 0.3
    }
    val df = rows.toDF("y", "x1").cache()
    val raw = Seq(col("x1"))
    val stats = Learn.standardStats(df, raw)
    val xs = lit(1.0) +: raw.zip(stats).map { case (r, (mu, sd)) =>
      (r - lit(mu)) / lit(sd)
    }
    val w = Learn.logisticFit(df, col("y"), xs, iters = 10, lr = 8.0)
    val acc = df.select(
        ((Learn.score(w.toSeq, xs) >= 0.5).cast("double") === col("y"))
          .cast("long").as("ok"))
      .agg(avg(col("ok"))).as[Double].head()
    df.unpersist()
    assert(acc > 0.95, s"accuracy $acc should clear the 0.70 base rate")
  }

  test("fastSigmoid: range, midpoint and monotonicity") {
    val got = Seq(-1e9, -1.0, 0.0, 1.0, 1e9).toDF("z")
      .select(Learn.fastSigmoid(col("z"))).as[Double].collect().toSeq
    assert(got(2) == 0.5)
    assert(got == got.sorted)
    assert(got.head > 0.0 && got.last < 1.0)
    assert(got(1) == 0.25 && got(3) == 0.75) // 0.5 ± 1/(2·2)
  }
}
