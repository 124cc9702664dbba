package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * P11: explicit-edge bucketize → bin ordinal
 * (reference `pd.cut(col, bins=edges, labels=False)`, `model.py:172-181`,
 * edges from `nn_bins.pickle`).
 *
 * pandas `cut` semantics: bins are (edge_i, edge_{i+1}] — left-open,
 * right-closed; values outside [edges.head, edges.last] → null.
 * A chained `when` stays codegen-friendly for the edge counts the reference
 * uses; for very long edge lists a Bucketizer-style binary search Expression
 * would be the upgrade path.
 */
object Bucketize {

  def apply(c: Column, edges: Seq[Double]): Column = {
    require(edges.size >= 2, "need at least two edges")
    // Unmatched `when` yields null, so coalesce picks the (unique) matching
    // bin and leaves out-of-range values null — pandas NaN.
    val bins = edges.sliding(2).zipWithIndex.map {
      case (Seq(lo, hi), i) => when(c > lo && c <= hi, i)
      case _ => lit(null)
    }.toSeq
    coalesce(bins: _*)
  }
}
