package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // reference Morton interleave for expectations
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave over the full 16x16 grid") {
    val df = (0L until 16L).flatMap(x => (0L until 16L).map(y => (x, y)))
      .toDF("x", "y")
    val out = df.select(col("x"), col("y"),
      ZOrder.zValue(col("x"), col("y"), 4).as("z")).collect()
    out.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1), 4))
    }
    // a bijection: 256 distinct z values covering 0..255
    assert(out.map(_.getLong(2)).sorted.toSeq == (0L until 256L))
  }

  test("aligned z-ranges are square cells (the multi-column pruning claim)") {
    // every aligned 16-value z block of a 4-bit curve is a 4x4 cell: a
    // zone map over such a block bounds BOTH dimensions to a 4-extent,
    // which is exactly why a z-range scan prunes on either column
    val pts = for (x <- 0L until 16L; y <- 0L until 16L)
      yield (morton(x, y, 4), x, y)
    pts.groupBy(_._1 / 16).foreach { case (_, cell) =>
      val (xs, ys) = (cell.map(_._2), cell.map(_._3))
      assert(cell.size == 16)
      assert(xs.max - xs.min == 3 && ys.max - ys.min == 3,
        s"cell not square: x span ${xs.min}..${xs.max}, y ${ys.min}..${ys.max}")
    }
  }

  test("layoutBy yields disjoint per-partition z-ranges (zone-map shape)") {
    val df = (0L until 512L).map(i => (i % 31, (i * 7) % 29)).toDF("a", "b")
    val laid = ZOrder.layoutBy(df, ZOrder.zValue(col("a"), col("b"), 5), 4)
      .select(ZOrder.zValue(col("a"), col("b"), 5).as("z"))
    val ranges = laid.rdd.glom().collect().toSeq
      .filter(_.nonEmpty)
      .map(p => (p.map(_.getLong(0)).min, p.map(_.getLong(0)).max))
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping partition z-ranges: $ranges")
      case _ => ()
    }
  }
}
