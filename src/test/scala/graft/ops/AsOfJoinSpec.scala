package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: most recent right row with t <= left t, inclusive
  * at equal timestamps, null when nothing precedes, per key. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("carries the latest prior (inclusive) right payload per key") {
    val left = Seq((1L, 5L, 1L), (1L, 10L, 2L), (1L, 3L, 3L), (2L, 7L, 4L))
      .toDF("k", "t", "id")
    val right = Seq((1L, 4L, 40.0), (1L, 10L, 100.0), (2L, 9L, 90.0))
      .toDF("k", "t", "v")
    val got = AsOfJoin(left, right, Seq("k"), "t", tiebreak = $"id")
      .orderBy("id").select("id", "v").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq == Seq(
      (1L, Some(40.0)),   // t=5 → right t=4
      (2L, Some(100.0)),  // t=10 → right t=10 (inclusive)
      (3L, None),         // t=3 → nothing precedes
      (4L, None)))        // k=2, t=7 → right t=9 is later
  }

  test("agrees with the naive inequality-join formulation on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 120).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "id")
    val right = (1 to 60).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong * 2, i.toDouble))
      .toDF("k", "t", "v")
      // dedupe (k,t) so "the" most recent right row is well-defined
      .groupBy("k", "t").agg(org.apache.spark.sql.functions.max("v").as("v"))
    val composed = AsOfJoin(left, right, Seq("k"), "t", tiebreak = $"id")
      .select("id", "v").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val naive = left.as("l")
      .join(right.as("r"), $"l.k" === $"r.k" && $"r.t" <= $"l.t", "left")
      .groupBy($"id")
      .agg(org.apache.spark.sql.functions.max_by($"r.v", $"r.t").as("v"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(composed == naive)
  }

  test("left rows and columns are preserved unchanged") {
    val left = Seq((1L, 5L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 1L, 7.0)).toDF("k", "t", "v")
    val got = AsOfJoin(left, right, Seq("k"), "t", tiebreak = lit(0L))
    assert(got.columns.toSeq == Seq("k", "t", "tag", "v"))
    assert(got.head().toSeq == Seq(1L, 5L, "x", 7.0))
  }
}
