package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) multi-dimensional layout — the storage-clustering
 * technique behind multi-column data skipping (Delta/Iceberg `ZORDER BY`):
 * interleaving the bits of two quantized dimensions gives a 1-D sort key
 * whose ranges are 2-D locality cells, so min/max zone maps prune scans
 * filtered on EITHER dimension (a plain sort on (a, b) only ever prunes
 * on `a`).
 *
 * Everything is 64-bit integer shifts/masks — bit-identical in any engine
 * ([[zValueSql]] emits the same expression for an external replay), and a
 * pure projection: computing the key costs no shuffle; LAYING OUT by the
 * key costs the one range exchange any clustered write pays
 * ([[layoutBy]]).
 */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * x's bit i lands at position 2i, y's at 2i+1. bits <= 31. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The identical interleave as ANSI SQL over expressions `x` and `y` —
    * same shifts, same OR-fold order, so any 64-bit engine replays the key
    * bit-for-bit. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Cluster a frame by the z-key: one range exchange + in-partition sort,
    * so each written file covers a compact z-range (= a compact cell in
    * both source dimensions) and its min/max footer prunes on either
    * column. The write-side cost every clustered layout pays once. */
  def layoutBy(df: DataFrame, z: Column, partitions: Int): DataFrame =
    df.withColumn("_z", z)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
}
