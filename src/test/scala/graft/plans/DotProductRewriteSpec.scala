package graft.plans

import graft.SparkSpec
import graft.functions.DotProduct
import org.apache.spark.sql.functions._

class DotProductRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("rewrites aggregate(zip_with(mul), 0.0, add) into native DotProduct") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      // non-foldable input — literals would be constant-folded away
      // before the plan can be inspected
      val df = spark.range(1, 2).select(
        array($"id".cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      val q = df.select(hofDot($"a", $"b").as("d"))
      val optimized = q.queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(_.isInstanceOf[DotProduct])),
        s"no DotProduct in:\n$optimized")
      assert(q.as[Double].head() == 11.0) // [1,2]·[3,4]
      // a non-matching fold (different seed) must NOT be rewritten
      val other = df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(1.0),
          (acc, x) => acc + x).as("d"))
      assert(!other.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[DotProduct])))
      assert(other.as[Double].head() == 12.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("does NOT rewrite lookalike folds that compute something else") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val df = spark.range(1, 2).select(
        array($"id".cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"),
        array($"id".cast("float"), lit(2.0f)).as("af"),
        array(lit(3.0f), lit(4.0f)).as("bf"))
      def noRewrite(q: org.apache.spark.sql.DataFrame): Unit =
        assert(!q.queryExecution.optimizedPlan.expressions
          .exists(_.exists(_.isInstanceOf[DotProduct])),
          s"unexpected DotProduct in:\n${q.queryExecution.optimizedPlan}")

      // zip lambda uses only ONE of its parameters: sum of squares of a
      val squares = df.select(
        aggregate(zip_with($"a", $"b", (x, _) => x * x), lit(0.0),
          (acc, v) => acc + v).as("d"))
      noRewrite(squares)
      assert(squares.as[Double].head() == 5.0) // 1^2 + 2^2, NOT 11.0

      // merge lambda ignores the accumulator: (acc, v) -> v + v
      val doubled = df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
          (_, v) => v + v).as("d"))
      noRewrite(doubled)
      assert(doubled.as[Double].head() == 16.0) // last product twice, NOT 11.0

      // float arrays: HOF multiplies in float precision; DotProduct is
      // double — a rewrite could change last-ulp results
      noRewrite(df.select(
        aggregate(zip_with($"af", $"bf", (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("d")))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }
}
