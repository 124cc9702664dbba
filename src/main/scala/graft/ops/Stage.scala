package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Single-evaluation staging for expensive expressions.
 *
 * A Spark `Column` is an expression TREE: selecting `f(x)` and `f(x)/n`
 * embeds two full copies of `f(x)`, and `CollapseProject` folds staged
 * projections back together, re-inlining a shared intermediate into every
 * consumer. Whole-stage codegen recovers this via subexpression
 * elimination — but interpreted paths (higher-order functions with struct
 * accumulators, CodegenFallback expressions) do not, so each reference
 * re-executes the subtree (measured: d12's repetition metrics evaluated
 * the tokenizer ~7x and each sort+fold twice — 3.3 s for a 5 000-row
 * projection).
 *
 * [[materialize]] pins intermediates as CONCRETE attributes behind a
 * `Generate` node: `inline(array(struct(...)))` emits exactly one row per
 * input row, the generator evaluates each expression ONCE, and
 * CollapseProject cannot cross a Generate. No shuffle, no extra rows, no
 * caching — a pure plan-shape barrier.
 */
object Stage {

  /** `df` + each (expr AS name) evaluated exactly once, as real columns.
    * Names must not collide with existing columns. */
  def materialize(df: DataFrame, exprs: (Column, String)*): DataFrame =
    df.select(col("*"),
      inline(array(struct(exprs.map { case (c, n) => c.as(n) }: _*))))
}
