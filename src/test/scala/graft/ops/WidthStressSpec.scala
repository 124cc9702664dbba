package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reference-width stress: the reference's real feature matrix is built from
  * a 330-code MCC vocabulary across multiple families (~1,000 columns,
  * run.py:105,238-430). The conditional-aggregation pivot is optimal at the
  * testdata's 5-entry vocab but measurably breaks at reference width (990
  * aggregates in one HashAggregate): Janino's 64 KB method limit forces an
  * interpreted fallback, and the default nested-class split
  * (spark.sql.codegen.aggregate.splitAggregateFunc.enabled) hard-crashes
  * with an IllegalAccessError on BufferedRowIterator.partitionIndex under
  * JDK 17 — both observed on this exact lattice. Pivots.pivotWide is the
  * shape that survives: narrow codegen'd cell aggregate → per-family maps →
  * splittable wide projection. This spec pins its correctness at width 330
  * and that the cell-level aggregation stays whole-stage codegen'd. */
class WidthStressSpec extends SparkSpec {

  // 20 users × 330 rows; user u sees 33 distinct codes, 10 times each
  // (gcd(20, 330) = 10 → the (id%20, id%330) lattice has period 660)
  private def lattice = spark.range(6600).select(
    (col("id") % 20).as("u"),
    concat(lit("c"),
      lpad((col("id") % 330).cast("string"), 3, "0")).as("code"),
    ((col("id") % 97).cast("double") + 0.5).as("amt"))

  test("pivotWide at 330-code vocab × 3 families + stats: correct, codegen on") {
    // WSC refuses schemas wider than maxFields (default 100) — raising it
    // is part of the documented reference-width configuration
    spark.conf.set("spark.sql.codegen.maxFields", "1500")
    try {
      val vocab = (0 until 330).map(i => f"c$i%03d")
      val fm = Pivots.pivotWide(lattice, "u", "code", vocab, Seq(
        Pivots.Family("freq", count(col("amt")).cast("double")),
        Pivots.Family("proc", sum(col("amt"))),
        Pivots.Family("big", sum(when(col("amt") > 50.0, col("amt"))))))
      val st = HorizontalStats.withStats(fm, vocab.map(v => s"freq_$v"), "hs")
      assert(st.columns.length == 1 + 3 * 330 + HorizontalStats.statNames.size)
      val rows = st.collect()
      assert(rows.length == 20)
      rows.foreach { r =>
        // 33 positive freq cells of exactly 10 → mean 10, var 0
        assert(r.getAs[Double]("hs_mean") == 10.0)
        assert(r.getAs[Double]("hs_median") == 10.0)
        assert(r.getAs[Double]("hs_std") == 0.0)
        assert(r.getAs[Double]("hs_max") == 10.0)
      }
      // spot cell: user 0 × c000 = ids {0, 660, ..., 5940},
      // sum(amt) = sum(id % 97) + 10*0.5 = 406 + 5
      val u0 = rows.find(_.getLong(0) == 0L).get
      assert(u0.getAs[Double]("proc_c000") == 411.0)
      assert(u0.getAs[Double]("freq_c000") == 10.0)
      assert(u0.getAs[Double]("freq_c001") == 0.0) // unoccupied cell fills
      // the cell-level aggregate must remain inside a whole-stage-codegen
      // span ("*(n)" markers); the map-assembly stage is ObjectHashAggregate
      // (collect_list) by design
      val plan = st.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"no codegen span in:\n${plan.take(2000)}")
      assert(plan.contains("ObjectHashAggregate"))
    } finally spark.conf.unset("spark.sql.codegen.maxFields")
  }

  test("pivotWide equals the conditional-aggregation pivot at small vocab") {
    val vocab = Seq("c000", "c005", "c017", "c290")
    val wide = Pivots.pivotWide(lattice, "u", "code", vocab, Seq(
      Pivots.Family("freq", count(col("amt")).cast("double")),
      Pivots.Family("proc", sum(col("amt")))))
    val freq = Pivots.pivotCount(lattice, "u", "code", vocab, "amt", "freq")
    val procp = Pivots.pivotSum(lattice, "u", "code", vocab, "amt", "proc")
    val narrow = freq.join(procp, Seq("u"))
      .select(col("u") +:
        (vocab.map(v => col(s"freq_$v").cast("double").as(s"freq_$v")) ++
          vocab.map(v => col(s"proc_$v"))): _*)
    val a = wide.orderBy("u").collect().map(_.toSeq)
    val b = narrow.orderBy("u").collect().map(_.toSeq)
    assert(wide.columns.toSeq == narrow.columns.toSeq)
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach {
        case (xv: Double, yv: Double) => assert(math.abs(xv - yv) < 1e-9)
        case (xv, yv) => assert(xv == yv)
      }
    }
  }
}
