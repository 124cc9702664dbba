package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins TokenOverlap to the relational explode + count-join + least-sum
  * form it replaces (the d94 contract), including the null-token,
  * null-array and empty edges. */
class TokenOverlapSpec extends SparkSpec {

  import spark.implicits._

  private def relational(df: org.apache.spark.sql.DataFrame)
  : Map[Long, Long] = {
    def cnt(c: String, side: String) =
      df.select(col("id"), explode(col(c)).as("tok"))
        .groupBy(col("id"), col("tok"))
        .agg(count(lit(1)).as(s"c_$side"))
    cnt("a", "p").join(cnt("b", "g"), Seq("id", "tok"))
      .groupBy(col("id"))
      .agg(sum(least(col("c_p"), col("c_g"))).as("ov"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def native(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("id"),
        coalesce(TokenOverlap.tokenOverlap(col("a"), col("b")), lit(0L))
          .as("ov"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random multisets match the relational form") {
    val rng = new scala.util.Random(3)
    val vocabulary = Vector("a", "bb", "ccc", "d0", "e", "größe", "日本")
    val rows = (0L until 300L).map { i =>
      def arr() = Seq.fill(rng.nextInt(30))(
        vocabulary(rng.nextInt(vocabulary.size)))
      (i, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val rel = relational(df)
    val nat = native(df)
    rows.foreach { case (i, _, _) =>
      assert(nat(i) == rel.getOrElse(i, 0L), s"row $i")
    }
  }

  test("edges: empty, disjoint, identical, duplicates, null tokens") {
    val df = Seq[(Long, Seq[String], Seq[String])](
      (0L, Seq(), Seq("x")),
      (1L, Seq("x"), Seq()),
      (2L, Seq("x", "y"), Seq("z")),
      (3L, Seq("x", "y", "x"), Seq("x", "y", "x")),
      (4L, Seq("x", "x", "x"), Seq("x")),
      (5L, Seq("x"), Seq("x", "x", "x")),
      (6L, Seq("x", null, "y"), Seq(null, "x", null))
    ).toDF("id", "a", "b")
    val rel = relational(df)
    val nat = native(df)
    (0L to 6L).foreach { i =>
      assert(nat(i) == rel.getOrElse(i, 0L), s"row $i")
    }
    // spot values: null tokens never match (row 6 overlaps only on "x")
    assert(nat(6L) == 1L)
    assert(nat(3L) == 3L && nat(4L) == 1L && nat(5L) == 1L)
  }

  test("null array propagates (caller coalesces)") {
    val df = Seq[(Long, Seq[String], Seq[String])](
      (0L, null, Seq("x")), (1L, Seq("x"), null), (2L, null, null)
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      TokenOverlap.tokenOverlap(col("a"), col("b")).as("ov")).collect()
    assert(out.forall(_.isNullAt(1)))
  }
}
