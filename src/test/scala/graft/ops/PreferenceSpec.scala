package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Crafted-input checks for the preference-aggregation operators (d78):
  * the deterministic pairing semantics and the Bradley–Terry MM fixed
  * point with its virtual-anchor regularization. The driver's DuckDB
  * oracle replays both at data scale; these pin the math. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: one-iteration values exact, anchor included") {
    // single pair, a beats b twice. W_a = 2+1 = 3, W_b = 0+1 = 1.
    // s0 = 1: pair term 2/(1+1) = 1; denom = 1 + 2/(1+1) = 2 for both
    // → s1_a = 3/2 = 1.5, s1_b = 1/2 = 0.5
    val pairs = Seq(("a", "b", 2L, 2L)).toDF("i", "j", "n", "wins_i")
    val got = Preference.bradleyTerry(pairs, iters = 1)
      .select("item", "n_games", "n_wins", "strength")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 2L, 1.5), ("b", 2L, 0L, 0.5)))
  }

  test("bradleyTerry: transitive dominance orders strengths") {
    // a beats b, b beats c, a beats c — strict hierarchy survives the
    // MM iterations; zero-win c stays positive (the anchor's virtual win)
    val pairs = Seq(("a", "b", 4L, 3L), ("b", "c", 4L, 3L),
      ("a", "c", 4L, 4L)).toDF("i", "j", "n", "wins_i")
    val m = Preference.bradleyTerry(pairs, iters = 3)
      .select("item", "strength").as[(String, Double)].collect().toMap
    assert(m("a") > m("b") && m("b") > m("c"))
    assert(m("c") > 0.0)
  }

  test("pairComparisons: each key used once, cross-group only, exact") {
    val df = (0L until 400L)
      .map(i => (i, s"g${i % 5}", (i % 13).toDouble)).toDF("k", "g", "q")
    val pairs = Preference.pairComparisons(df, col("k"), col("g"),
      col("q"), buckets = 16)
    val rows = pairs.select("i", "j", "n", "wins_i")
      .as[(String, String, Long, Long)].collect().toSeq
    // canonical orientation, sane counts
    assert(rows.forall { case (i, j, n, wi) =>
      i < j && n >= 1 && wi >= 0 && wi <= n })
    // every key participates in AT MOST one comparison: total games ≤
    // half the rows (same-group neighbours and odd tails drop)
    assert(rows.map(_._3).sum <= 200L)
    // deterministic under repartitioning
    val again = Preference.pairComparisons(df.repartition(7), col("k"),
        col("g"), col("q"), buckets = 16)
      .select("i", "j", "n", "wins_i")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rows.sorted == again.sorted)
  }

  test("lengthBiasAudit: exact counts on a crafted outcome set") {
    // hand-built outcomes: pair (1,2) won by 1, pair (3,4) won by 4 —
    // lengths 1:10, 2:5 (winner longer), 3:7, 4:7 (equal), so group x
    // (docs 1,3): 2 games, 1 win, longer once, won it; y (2,4): 2 games,
    // 1 win, never longer → share NULL
    val outcomes = Seq(
      (1L, "x", 0.9, 2L, "y", 0.1, 1L, "x"),
      (3L, "x", 0.2, 4L, "y", 0.8, 4L, "y"))
      .toDF("key_a", "group_a", "score_a", "key_b", "group_b",
        "score_b", "win_key", "win_group")
    val lengths = Seq((1L, 10L), (2L, 5L), (3L, 7L), (4L, 7L))
      .toDF("k", "len")
    val got = Preference.lengthBiasAudit(outcomes, lengths)
      .select("grp", "n_games", "n_wins", "n_longer", "wins_longer",
        "wins_shorter", "longer_win_share")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(("x", 2L, 1L, 1L, 1L, 0L, Some(1.0)),
      ("y", 2L, 1L, 0L, 0L, 0L, None)))
  }

  test("pairComparisons: winner by score, key breaks ties") {
    // bucket count 1 → one stream; hash order decides neighbours, so
    // recover the pairing and check each winner against the inputs
    val df = Seq((1L, "x", 5.0), (2L, "y", 3.0), (3L, "x", 7.0),
      (4L, "y", 7.0), (5L, "z", 1.0), (6L, "z", 9.0))
      .toDF("k", "g", "q")
    val qOf = Map(1L -> 5.0, 2L -> 3.0, 3L -> 7.0, 4L -> 7.0,
      5L -> 1.0, 6L -> 9.0)
    val gOf = Map(1L -> "x", 2L -> "y", 3L -> "x", 4L -> "y",
      5L -> "z", 6L -> "z")
    val pairs = Preference.pairComparisons(df, col("k"), col("g"),
        col("q"), buckets = 1)
      .select("i", "j", "n", "wins_i")
      .as[(String, String, Long, Long)].collect()
    // reconstruct expected outcomes from the same hash order
    val h = df.select(col("k"),
        Dedup.md5Hash(col("k").cast("string"), lit("bt.o")).as("h"))
      .as[(Long, Long)].collect().sortBy(r => (r._2, r._1)).map(_._1)
    val expected = h.grouped(2).filter(_.length == 2)
      .map { case Array(a, b) => (a, b) }
      .filter { case (a, b) => gOf(a) != gOf(b) }
      .map { case (a, b) =>
        val win = if (qOf(a) > qOf(b)) gOf(a)
          else if (qOf(b) > qOf(a)) gOf(b)
          else if (a < b) gOf(a) else gOf(b)
        val (i, j) = if (gOf(a) < gOf(b)) (gOf(a), gOf(b))
          else (gOf(b), gOf(a))
        (i, j, win)
      }.toSeq
    val expAgg = expected.groupBy(t => (t._1, t._2)).map {
      case ((i, j), ts) =>
        (i, j, ts.size.toLong, ts.count(_._3 == i).toLong)
    }.toSeq.sorted
    assert(pairs.toSeq.sorted == expAgg)
  }

  test("groupAdvantage: hand-computed normalization per group") {
    // group g1 = [10, 20, 30]: mean 20, var (100+400+900)/3 - 400 =
    //   200/3, std sqrt(200/3) ≈ 8.164966 → advantages ∓1.224745, 0
    // group g2 = [5, 5]: std 0 → both advantages 0 (zero-gradient)
    // group g3 = [7]: singleton → advantage 0
    val df = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g1", 30L),
      (4L, "g2", 5L), (5L, "g2", 5L), (6L, "g3", 7L))
      .toDF("k", "g", "r")
    val out = Preference.groupAdvantage(df, col("k"), col("g"), col("r"))
      .select("key", "n_group", "r_mean", "r_std", "advantage")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val std = math.sqrt(200.0 / 3.0)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out(1L) == ((1L, 3L, 20.0, r6(std), r6((10 - 20) / std))))
    assert(out(2L) == ((2L, 3L, 20.0, r6(std), 0.0)))
    assert(out(3L) == ((3L, 3L, 20.0, r6(std), r6((30 - 20) / std))))
    assert(out(4L) == ((4L, 2L, 5.0, 0.0, 0.0)))
    assert(out(5L) == ((5L, 2L, 5.0, 0.0, 0.0)))
    assert(out(6L) == ((6L, 1L, 7.0, 0.0, 0.0)))
  }
}
