package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * A1-A4 + P8 + P10: fixed-vocabulary pivot aggregates
 * (reference `run.py:238-246, 272-282, 290-322, 335-405`).
 *
 * The vocabulary is always passed explicitly (`pivot(col, values)`):
 *  - parity with the reference's closed-world `reindex(columns=...)` +
 *    `fillna(0)` (P8) — unseen categories dropped, absent ones zero-filled;
 *  - skips Spark's distinct-values discovery job — one fewer full scan,
 *    which matters when the input is 100 TB.
 *
 * A fixed-vocab pivot compiles to ONE hash aggregate over `groupBy(key)` —
 * a single shuffle on the grouping key, partial map-side combine included.
 */
object Pivots {

  /** Pivot `df` to one row per `key`, one column per vocabulary entry,
    * aggregated by `agg`; absent cells zero-filled. Columns are renamed
    * `prefix_<value>` (reference names its families `mcc_freq-<code>` etc.,
    * `run.py:243`). */
  def pivotAgg(df: DataFrame, key: String, pivotCol: String,
               vocab: Seq[Any], agg: Column, prefix: String): DataFrame = {
    val p = df.groupBy(col(key)).pivot(pivotCol, vocab).agg(agg)
    val renamed = vocab.foldLeft(p)((d, v) =>
      d.withColumnRenamed(v.toString, s"${prefix}_$v"))
    renamed.na.fill(0, vocab.map(v => s"${prefix}_$v"))
  }

  /** A1: pivot-count (`aggfunc='count'`, `run.py:238-246`). Counts the
    * non-null values of `valueCol`, exactly like pandas `count`. */
  def pivotCount(df: DataFrame, key: String, pivotCol: String,
                 vocab: Seq[Any], valueCol: String, prefix: String): DataFrame =
    pivotAgg(df, key, pivotCol, vocab, count(col(valueCol)), prefix)

  /** A2/A3: pivot-sum (`aggfunc='sum'`, `run.py:272-322`). */
  def pivotSum(df: DataFrame, key: String, pivotCol: String,
               vocab: Seq[Any], valueCol: String, prefix: String): DataFrame =
    pivotAgg(df, key, pivotCol, vocab, sum(col(valueCol)), prefix)

  /** P10: integer floor-division quantization of pivot cells
    * (`run.py:248-249`, `//= 20`). Defense: an attacker must move a count
    * past a bucket edge to change the feature. Cells are counts >= 0, so
    * `floor(a/b)` equals pandas `//`. */
  def floorDiv(df: DataFrame, cols: Seq[String], divisor: Int): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, floor(col(c) / lit(divisor)).cast("long")))
}
