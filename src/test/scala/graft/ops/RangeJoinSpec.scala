package graft.ops

import graft.SparkSpec

/** Banded range join: equals the naive inequality join, including pairs
  * that straddle band boundaries and exact-tolerance edges. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the naive inequality join across band boundaries") {
    // tol=10: bands [0,10), [10,20)... pairs straddling boundaries matter
    val left = Seq((1L, 100L, 9L), (1L, 101L, 10L), (1L, 102L, 25L),
      (2L, 103L, 9L)).toDF("k", "lid", "lt")
    val right = Seq((1L, 200L, 19L), (1L, 201L, 0L), (1L, 202L, 36L),
      (2L, 203L, 30L)).toDF("k", "rid", "rt")
    val banded = RangeJoin(left, right, Seq("k"), "lt", "rt", tol = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = left.join(right, Seq("k"))
      .filter(org.apache.spark.sql.functions.abs($"lt" - $"rt") <= 10)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(banded.contains((100L, 200L)))  // 9 vs 19: exactly tol apart
    assert(banded.contains((100L, 201L)))  // 9 vs 0: same band
    assert(!banded.contains((103L, 203L))) // 9 vs 30: beyond tol
  }
}
