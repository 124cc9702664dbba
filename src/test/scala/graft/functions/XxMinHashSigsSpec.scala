package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native xx_minhash_sigs expression: bit-for-bit parity with the
  * generic transform+array_min fold of xxhash64(s, j) that
  * minhashWideSigs's custom-family path builds, over random unicode
  * shingle arrays and the null-element / empty / null edges — the
  * guarantee that lets d49's production side take the one-pass native
  * path without changing a single emitted pair. */
class XxMinHashSigsSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  /** The generic-path form: sig_j = array_min(transform(sh, xxhash64(_, j)))
    * with the empty-array null guard minhashWideSigs applies. */
  private def genericSigs(sh: Column, k: Int): Column =
    when(size(sh) === 0, lit(null)).otherwise(
      array((0 until k).map(j =>
        array_min(transform(sh, x => xxhash64(x, lit(j))))): _*))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(16), Seed(seed)).get

  test("random unicode shingle arrays match the transform+array_min fold") {
    val shingle = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('#', ' ', 'é', 'ж', '中'))).map(_.mkString)
    val arr = Gen.listOf(shingle)
    val rows = (0 until 60).map(i => Tuple1(sample(arr, i.toLong))) :+
      Tuple1(List("")) :+ Tuple1(List("a" * 5000, ""))
    val df = rows.toDF("sh")
    df.select(XxMinHashSigs.xxMinhashSigs($"sh", K).as("n"),
        genericSigs($"sh", K).as("g"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"${r.getSeq[Long](0)} != ${r.getSeq[Long](1)}")
      }
  }

  test("null elements hash like xxhash64's skip; empty/null arrays → null") {
    // null ELEMENTS and the empty array follow the generic guarded fold;
    // a null ARRAY yields null like MinHashSigs (the generic fold would
    // give array(null×k) there, but minhashWideSigs can never feed it
    // one: tokens(null text) → empty shingle array, not null)
    val df = Seq(
      Tuple1(Option(Seq(Option("a"), None, Option("b")))),
      Tuple1(Option(Seq.empty[Option[String]]))
    ).toDF("sh")
    val got = df.select(XxMinHashSigs.xxMinhashSigs($"sh", K).as("n"),
        genericSigs($"sh", K).as("g"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    got.foreach { case (n, g) => assert(n == g, s"$n vs $g") }
    assert(got(1)._1.isEmpty)
    val nullArr = Seq(Tuple1(Option.empty[Seq[Option[String]]])).toDF("sh")
      .select(XxMinHashSigs.xxMinhashSigs($"sh", K).as("n")).collect()(0)
    assert(nullArr.isNullAt(0))
  }

  test("minhashWideSigs: the xxhashFamily native path equals the generic") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content with its own shingles here"),
      (4L, "xy"), // < n tokens -> empty shingles -> dropped by both paths
      (5L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    // a FRESH lambda (not `eq` xxhashFamily) forces the generic branch
    val genericFam: (Column, Column) => Column = (s, j) => xxhash64(s, j)
    val nat = Dedup.minhashWideSigs(docs, "doc_id", "text", n = 3, k = K,
      hashFamily = Dedup.xxhashFamily)
    val gen = Dedup.minhashWideSigs(docs, "doc_id", "text", n = 3, k = K,
      hashFamily = genericFam)
    val n = nat.orderBy("doc").collect().map(_.toSeq)
    val g = gen.orderBy("doc").collect().map(_.toSeq)
    assert(n.length == 4 && n.toSeq == g.toSeq)
  }
}
