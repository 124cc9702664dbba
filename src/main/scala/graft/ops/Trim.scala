package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * W1 + J3: per-group head/tail trim and vanished-key tracking
 * (reference `run.py:196-202`: drop the first 20 and last 20 rows of each
 * user — defense against edge-injection; users with <= 2n rows disappear
 * entirely and later re-enter with the fallback score, J4).
 *
 * The reference relies on file row order as event order; we standardize on
 * (ts, tiebreaker) ordering (SURVEY.md §1.1).
 *
 * Cost: one shuffle on the partition key; both row_numbers share a single
 * sort because the descending rank is derived from the ascending one and the
 * partition count — no second Window pass.
 */
object Trim {

  /** Drop the first `n` and last `n` rows of each group. */
  def headTail(df: DataFrame, n: Int, partCols: Seq[String],
               orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(partCols.map(col): _*)))
      .filter(col("_rn") > n && col("_rn") <= col("_cnt") - n)
      .drop("_rn", "_cnt")
  }

  /** J3: keys present in `before` but absent from `after`
    * (`np.setdiff1d`, `run.py:200-202`). */
  def vanishedKeys(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame =
    before.select(keyCols.map(col): _*).distinct()
      .join(after.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
}
