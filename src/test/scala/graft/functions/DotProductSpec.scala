package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native dot_product expression: parity with the HOF composition it
  * replaces, null semantics, float/double element types, SQL registration. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("matches the aggregate(zip_with(...)) fold bit for bit") {
    val rows = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, -0.6f)),
      (Seq.empty[Float], Seq.empty[Float]))
    val df = rows.toDF("a", "b")
    val got = df.select(DotProduct($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).as[(Double, Double)].collect()
    got.foreach { case (n, h) => assert(n == h, s"$n != $h") }
    assert(got(0)._1 == 32.0)
  }

  test("double arrays and null semantics (mismatched length, null array)") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (Some(Seq(1.0)), Some(Seq(3.0, 4.0))),   // length mismatch
      (None, Some(Seq(1.0))))                   // null input
      .toDF("a", "b")
    val got = df.select(DotProduct($"a", $"b")).collect()
      .map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None))
  }

  test("registered as SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
