package graft.functions

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native word_shingles expression: bit-for-bit parity with the
  * relational transform+slice+concat_ws form TextOps.shingles built
  * through r17, over random unicode token arrays and the short-doc /
  * null-token / null-array edges. */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r18 relational form, verbatim. */
  private def legacy(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(16), Seed(seed)).get

  test("random unicode token arrays match the legacy form, n = 2..4") {
    val token = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ж', '中'))).map(_.mkString)
    val arr = Gen.listOf(token)
    val rows = (0 until 50).map(i => Tuple1(sample(arr, i.toLong))) :+
      Tuple1(List("a")) :+ Tuple1(List.empty[String]) :+
      Tuple1(List("x", "y")) :+ Tuple1(List("a" * 2000, "b", "c"))
    val df = rows.toDF("toks")
    for (n <- 2 to 4) {
      df.select(TextOps.shingles($"toks", n).as("nat"),
          legacy($"toks", n).as("leg"))
        .collect().foreach { r =>
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"n=$n: ${r.getSeq[String](0)} != ${r.getSeq[String](1)}")
        }
    }
  }

  test("null tokens are skipped like concat_ws; null array → empty") {
    val df = Seq(
      Tuple1(Option(Seq(Option("a"), None, Option("b"), Option("c")))),
      Tuple1(Option.empty[Seq[Option[String]]])
    ).toDF("toks")
    val got = df.select(TextOps.shingles($"toks", 3).as("nat"),
        legacy($"toks", 3).as("leg"))
      .collect()
    assert(got(0).getSeq[String](0) == got(0).getSeq[String](1))
    assert(got(0).getSeq[String](0) == Seq("a b", "b c"))
    // legacy: size(null) is null -> otherwise -> empty; native+coalesce same
    assert(got(1).getSeq[String](0) == got(1).getSeq[String](1))
    assert(got(1).getSeq[String](0).isEmpty)
  }

  test("end-to-end: docShingles over text matches under both forms") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "one two"),
      (3L, ""),
      (4L, "Ünïcode teXt with 123 numbers and-punct!uation here too")
    ).toDF("doc_id", "text")
    val toks = TextOps.tokens($"text")
    val a = docs.select($"doc_id", TextOps.shingles(toks, 3).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val b = docs.select($"doc_id", legacy(toks, 3).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(a == b)
    assert(a(1L).head == "the quick brown")
  }
}
