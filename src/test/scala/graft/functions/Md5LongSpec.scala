package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native md5_long expression: bit-for-bit parity with the relational
  * conv(substring(md5(x), 1, 15), 16, 10)::long form every DuckDB
  * oracle replays, over random unicode strings, binary payloads, and
  * the empty/null edges. */
class Md5LongSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(24), Seed(seed)).get

  private def relational(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("string input matches the conv form on random unicode") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('#', ' ', 'é', 'ж', '中', '')))
      .map(_.mkString)
    val rows = (0 until 60).map(i => Tuple1(sample(gen, i.toLong))) :+
      Tuple1("") :+ Tuple1("#") :+ Tuple1("a" * 10000)
    val df = rows.toDF("s")
    df.select(Md5Long($"s").as("n"), relational($"s").as("r"))
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"${r.getLong(0)} != ${r.getLong(1)}"))
  }

  test("binary input matches; null stays null") {
    val rows = Seq(Some(Array[Byte](1, 2, 3)), Some(Array.empty[Byte]),
      None).toDF("b")
    val got = rows
      .select(Md5Long($"b").as("n"), relational($"b").as("r"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    got.foreach { case (n, r) => assert(n == r, s"$n vs $r") }
    assert(got(2)._1.isEmpty)
  }

  test("md5Hash-form parity: concat with seed suffix, non-ascii seeds") {
    val df = Seq(("doc 1", "dx"), ("", ""), ("très", "salt#x"))
      .toDF("s", "seed")
    val c = concat($"s", lit("#"), $"seed")
    df.select(Md5Long(c).as("n"), relational(c).as("r"))
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
