package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native centered_dot_long expression (the r18 cross-modal hot-loop
  * replacement): exact parity with the HOF composition it replaced,
  * null semantics, and the towerNorm2 self-dot case. Plain scalacheck
  * generators sampled deterministically (the PropertiesSpec pattern). */
class CenteredDotLongSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(16), Seed(seed)).get

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column, c: Long) =
    aggregate(zip_with(a, b, (x, y) => (x - c) * (y - c)),
      lit(0L), (acc, v) => acc + v)

  test("matches the aggregate(zip_with(...)) long fold exactly") {
    val gen = Gen.listOfN(16, Gen.choose(0L, 255L))
    val rows = (0 until 40).map { i =>
      (sample(gen, i.toLong), sample(gen, 1000L + i))
    }
    val df = rows.toDF("a", "b")
    df.select(
      CenteredDotLong($"a", $"b", 128L).as("native"),
      hofDot($"a", $"b", 128L).as("hof"),
      CenteredDotLong($"a", $"a", 128L).as("norm_native"),
      hofDot($"a", $"a", 128L).as("norm_hof")).collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("empty arrays fold to 0, like the HOF") {
    val df = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val r = df.select(CenteredDotLong($"a", $"b", 128L),
      hofDot($"a", $"b", 128L)).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }

  test("null semantics: length mismatch, null array, null element") {
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L), Some(4L)))),
      (Some(Seq(Some(1L))), Some(Seq(Some(3L), Some(4L)))), // mismatch
      (None, Some(Seq(Some(1L)))),                          // null array
      (Some(Seq(Some(1L), None)), Some(Seq(Some(3L), Some(4L)))))
      .toDF("a", "b")
    val got = df
      .select(CenteredDotLong($"a", $"b", 128L).as("n"),
        hofDot($"a", $"b", 128L).as("h"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    // row 0 computes, rows 1-3 are null on BOTH forms
    assert(got(0)._1.isDefined && got(0)._1 == got(0)._2)
    got.drop(1).foreach { case (n, h) =>
      assert(n.isEmpty && h.isEmpty, s"$n vs $h")
    }
  }
}
