package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Native MinHashSigs vs the relational md5 min-aggregation, on random
  * inputs and through the SQL registry. */
class MinHashSigsSpec extends SparkSpec {

  import spark.implicits._

  test("random corpora: native signature == relational min-agg, any k") {
    val rnd = new scala.util.Random(20260812)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "x1", "y2", "z3")
    val docs = (1L to 60L).map { id =>
      val len = 1 + rnd.nextInt(12)
      (id, Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (k <- Seq(4, 16)) {
      val native = docs.select($"doc_id",
          MinHashSigs.minhashSigs(array_distinct(
            graft.ops.TextOps.shingles(
              graft.ops.TextOps.tokens($"text"), 3)), k).as("sig"))
        .filter($"sig".isNotNull)
        .select($"doc_id" +: (0 until k).map(j =>
          element_at($"sig", j + 1).as(s"sig$j")): _*)
      val relational = Dedup.minhashSignatures(
          Dedup.docShingles(docs, "doc_id", "text", 3), k)
        .withColumnRenamed("doc", "doc_id")
      assert(native.exceptAll(relational).isEmpty &&
        relational.exceptAll(native).isEmpty, s"diverged at k=$k")
    }
  }

  test("registered as SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    val sig = spark
      .sql("SELECT minhash_sigs(array('a b c', 'b c d'), 4) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
    // values replay the relational md5 family exactly
    val expect = spark.range(1).select((0 until 4).map(j =>
      least(Dedup.md5Hash(lit("a b c"), lit(j)),
        Dedup.md5Hash(lit("b c d"), lit(j))).as(s"m$j")): _*)
      .head()
    assert((0 until 4).map(expect.getLong) == sig)
    // empty array -> null (the "no shingles, no group" contract)
    assert(spark.sql(
      "SELECT minhash_sigs(cast(array() AS array<string>), 4)")
      .head().isNullAt(0))
  }
}
