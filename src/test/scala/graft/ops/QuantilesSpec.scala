package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exactGroupQuantiles matches the sorted-array interpolation") {
    // duplicates on purpose: rank selection must count multiplicity
    val vals = Seq(1.0, 1.0, 2.0, 4.0, 4.0, 4.0, 7.0, 10.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val fracs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Quantiles.exactGroupQuantiles(df, col("g"), col("v"), fracs)
      .select($"frac", $"q").as[(Double, Double)].collect().toMap
    val arr = df.groupBy($"g")
      .agg(sort_array(collect_list($"v")).as("arr"))
    fracs.foreach { f =>
      val expected = arr
        .select(Repair.interpPercentile(col("arr"), lit(f)))
        .collect()(0).getDouble(0)
      assert(got(f) == expected, s"frac $f: ${got(f)} vs $expected")
    }
  }

  test("exactGroupQuantiles is per-group and partition-invariant") {
    val df = ((1 to 100).map(i => ("a", i.toDouble))
      ++ (1 to 50).map(i => ("b", (i * 3).toDouble))).toDF("g", "v")
    val a = Quantiles.exactGroupQuantiles(df.repartition(7), col("g"),
      col("v"), Seq(0.5)).orderBy("grp").collect().map(_.getDouble(2)).toSeq
    val b = Quantiles.exactGroupQuantiles(df.repartition(2), col("g"),
      col("v"), Seq(0.5)).orderBy("grp").collect().map(_.getDouble(2)).toSeq
    assert(a == b)
    assert(a == Seq(50.5, 76.5)) // np.percentile(1..100, 50), (3..150 step 3, 50)
  }

  test("exactGroupQuantiles fails fast past maxDistinctPerGroup, names the group") {
    val df = ((1 to 200).map(i => ("big", i.toDouble))
      ++ (1 to 10).map(i => ("small", i.toDouble))).toDF("g", "v")
    // over the bound: a raw-continuous misuse must fail with a diagnostic,
    // not OOM a sort task at scale
    val e = intercept[Exception] {
      Quantiles.exactGroupQuantiles(df, col("g"), col("v"), Seq(0.5),
        maxDistinctPerGroup = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    val msg = messages(e).mkString("\n")
    assert(msg.contains("exactGroupQuantiles") && msg.contains("big"), msg)
    // at the bound: both groups fit, result identical to the unguarded run
    val ok = Quantiles.exactGroupQuantiles(df, col("g"), col("v"), Seq(0.5),
      maxDistinctPerGroup = 200L).orderBy("grp")
      .collect().map(_.getDouble(2)).toSeq
    assert(ok == Seq(100.5, 5.5))
  }
}
