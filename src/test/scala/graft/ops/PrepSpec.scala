package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** d63–d65 core properties: the leakage guarantee of out-of-fold target
  * encoding, whole-timestamp atomicity of the temporal split, and the
  * deterministic tie-break of the majority vote. */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ target encoding
  private def encMap(rows: Seq[(String, Long, Long)]) =
    Prep.outOfFoldTargetEncode(
      rows.toDF("category", "fold", "y"), m = 10.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("out-of-fold encoding excludes the row's own fold") {
    // category a: fold0 = {1,0}, fold1 = {1,1}, fold2 = {0}
    // category b: fold0 = {0},   fold1 = {0},   fold2 = {1}
    val base = Seq(
      ("a", 0L, 1L), ("a", 0L, 0L), ("a", 1L, 1L), ("a", 1L, 1L),
      ("a", 2L, 0L), ("b", 0L, 0L), ("b", 1L, 0L), ("b", 2L, 1L))
    val e = encMap(base)
    val prior = 4.0 / 8.0 // 4 positives of 8 overall
    def enc(otherPos: Long, otherN: Long, p: Double): Double =
      math.round(((otherPos + 10.0 * p) / (otherN + 10.0)) * 1e6) / 1e6
    // each fold's encoding is built from the OTHER folds only — a
    // leaking implementation would use the full category stats (a:
    // 3 of 5, b: 1 of 3) and fail every line below
    assert(e(("a", 0L))._3 === enc(2, 3, prior)) // folds 1,2: 2 pos / 3
    assert(e(("a", 1L))._3 === enc(1, 3, prior)) // folds 0,2: 1 pos / 3
    assert(e(("a", 2L))._3 === enc(3, 4, prior)) // folds 0,1: 3 pos / 4
    assert(e(("b", 2L))._3 === enc(0, 2, prior)) // folds 0,1: 0 pos / 2
    // and the raw per-fold counts are reported faithfully
    assert(e(("a", 1L))._1 === 2L && e(("a", 1L))._2 === 2L)
  }

  test("encoding shrinks rare categories toward the global prior") {
    // one positive-only row in category "rare": with m=10 smoothing its
    // out-of-fold encoding sits near the prior, not near 1.0
    val rows = Seq(("rare", 0L, 1L)) ++
      (1 to 50).map(i => ("big", (i % 3).toLong, (i % 2).toLong))
    val e = encMap(rows)
    val prior = (1 + 25) / 51.0
    val rare = e(("rare", 0L))._3
    // its only fold IS fold 0, so the out-of-fold stats are empty and
    // the smoothed encoding collapses to the prior exactly (mod 6-dp)
    assert(math.abs(rare - prior) < 1e-5,
      s"rare-category encoding $rare should collapse to prior $prior")
  }

  // ------------------------------------------------ temporal split
  test("temporal split cuts on whole timestamps, in time order") {
    val t = (h: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // 10 rows over 4 distinct timestamps: 4 + 3 + 2 + 1
    val df = (Seq.fill(4)(t(1)) ++ Seq.fill(3)(t(2)) ++
      Seq.fill(2)(t(3)) ++ Seq(t(4))).toDF("ts")
    val split = Prep.temporalSplitByTs(df, "ts",
      Seq(0.5 -> "train", 0.7 -> "gap"), last = "eval")
      .collect().map(r => r.getTimestamp(0) -> r.getString(1)).toMap
    // cum: t1=4 <= 5 -> train; t2=7 <= 7 -> gap; t3=9, t4=10 -> eval
    assert(split(t(1)) == "train")
    assert(split(t(2)) == "gap")
    assert(split(t(3)) == "eval")
    assert(split(t(4)) == "eval")
  }

  test("simultaneous rows never separate even when a cut lands mid-group") {
    val t = Timestamp.valueOf("2024-06-01 12:00:00")
    val df = Seq.fill(10)(t).toDF("ts") // one ts, any cut fraction
    val out = Prep.temporalSplitByTs(df, "ts",
      Seq(0.3 -> "train"), last = "test").collect()
    assert(out.length == 1) // one assignment for the one timestamp
  }

  // ------------------------------------------------ majority vote
  test("majority vote breaks count ties by vocabulary order") {
    val vocab = Seq("click", "error", "purchase", "signup", "view")
    val votes = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"), // clear majority: view
      (2L, "error"), (2L, "click"),              // tie -> click (idx 0)
      (3L, "signup"), (3L, "view"), (3L, "signup"), (3L, "view")
    ).toDF("item", "vote")
    val out = Prep.majorityVote(votes, "item", "vote", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ("view", 3L, 2L))
    assert(out(2L) == ("click", 2L, 1L)) // tie at 1-1: lower index wins
    assert(out(3L) == ("signup", 4L, 2L)) // tie at 2-2: signup < view
  }

  test("majority vote is one aggregation — no window, no second shuffle") {
    val vocab = Seq("a", "b")
    val votes = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("item", "vote")
    val plan = Prep.majorityVote(votes, "item", "vote", vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "packed-score argmax must not window")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges <= 1, s"expected one exchange, plan:\n$plan")
  }

  test("kAnonymity flags small groups and counts sensitive diversity") {
    val rows = Seq(
      // ("NY", 1): 3 rows, 2 distinct balances -> safe at k=3
      ("NY", 1, 100.0), ("NY", 1, 100.0), ("NY", 1, 200.0),
      // ("LA", 2): 2 rows -> at risk at k=3; l_div 1 (both share the
      // sensitive value — the homogeneous-group leak l-diversity sees)
      ("LA", 2, 300.0), ("LA", 2, 300.0))
      .toDF("segment", "region", "balance")
    val out = Prep.kAnonymity(rows, Seq("segment", "region"),
        col("balance"), k = 3L)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("l_div"),
          r.getAs[Long]("at_risk"))).toMap
    assert(out(("NY", 1)) == (3L, 2L, 0L))
    assert(out(("LA", 2)) == (2L, 1L, 1L))
  }

  test("agreementByPanel: hand-computed pooled kappa per panel size") {
    // panel 3: item A = [x,x,x] (3 agreeing pairs of 3), item B =
    //   [x,y,y] (1 of 3) -> po = 4/6; marginals x=4, y=2 of M=6 ->
    //   pe = (16+4)/36 = 5/9; kappa = (2/3 - 5/9)/(1 - 5/9) = 0.25
    // panel 2: item C = [x,y] (0 of 1), item D = [y,y] (1 of 1) ->
    //   po = 1/2; marginals x=1, y=3 of M=4 -> pe = 10/16;
    //   kappa = (0.5 - 0.625)/0.375 = -1/3
    // panel 4: item E = [z,z,z,z] alone -> pe = 1 -> kappa NULL
    // item F has ONE vote and must be excluded entirely
    val votes = (Seq.fill(3)(("A", "x")) ++ Seq(("B", "x"), ("B", "y"),
      ("B", "y"), ("C", "x"), ("C", "y"), ("D", "y"), ("D", "y")) ++
      Seq.fill(4)(("E", "z")) :+ ("F", "x")).toDF("item", "vote")
    val out = Prep.agreementByPanel(votes, "item", "vote")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), Option(r.get(6)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out.keySet == Set(2L, 3L, 4L)) // panel 1 (item F) dropped
    assert(out(3L) == (2L, 4L, 6L, 0.666667, 0.555556, Some(0.25)))
    assert(out(2L) == (2L, 1L, 2L, 0.5, 0.625, Some(-0.333333)))
    assert(out(4L)._6.isEmpty) // single occupied label: chance = 1
    assert(out(4L)._4 == 1.0 && out(4L)._5 == 1.0)
  }

  test("thresholdSweep: exact TP/FP/FN accounting at the grid boundary") {
    // steps = 2: thresholds 0, 0.5, 1. Scores on the micro grid:
    // 499999 sits BELOW the 0.5 cut, 500000 exactly ON it (score ≥ t
    // includes the boundary — bucket arithmetic must agree)
    val rows = Seq((0L, 1L), (499999L, 0L), (500000L, 1L), (1000000L, 0L))
      .toDF("sm", "y")
    val out = Prep.thresholdSweep(rows, col("sm"), col("y"), steps = 2)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double]),
          Option(r.get(7)).map(_.asInstanceOf[Double]))).toMap
    assert(out(0.0) == ((4L, 2L, 2L, 0L,
      Some(0.5), Some(1.0), Some(0.666667))))
    assert(out(0.5) == ((2L, 1L, 1L, 1L, Some(0.5), Some(0.5), Some(0.5))))
    assert(out(1.0) == ((1L, 0L, 1L, 2L, Some(0.0), Some(0.0), Some(0.0))))
  }

  test("sftExamples: context is the last k turns in order; first turn " +
      "emits nothing; fp is content-addressed") {
    // conversation 1: turns a b c d e → examples for b..e with contexts
    // "a", "a b", "a b c", then the k=3 window SLIDES: "b c d" for e.
    // conversation 2: single turn → no examples.
    val df = Seq((1L, 10L, "a"), (1L, 11L, "b"), (1L, 12L, "c"),
      (1L, 13L, "d"), (1L, 14L, "e"), (2L, 20L, "z"))
      .toDF("u", "eid", "turn")
    val out = Prep.sftExamples(df, col("u"), col("eid"),
        Seq(col("eid")), col("turn"), k = 3)
      .select("convo_id", "example_id", "context", "target", "n_ctx")
      .as[(Long, Long, String, String, Long)].collect().toSet
    assert(out == Set(
      (1L, 11L, "a", "b", 1L), (1L, 12L, "a b", "c", 2L),
      (1L, 13L, "a b c", "d", 3L), (1L, 14L, "b c d", "e", 3L)))
    // fingerprint = md5 of the rendered example, reproducible
    val fp = Prep.sftExamples(df, col("u"), col("eid"),
        Seq(col("eid")), col("turn"), k = 3)
      .filter(col("example_id") === 11L)
      .select("example_fp").as[String].head()
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("a => b".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp == md)
  }

  test("thresholdSweep: empty-above thresholds emit zero rows not gaps; " +
      "all-negative labels NULL the recall") {
    val rows = Seq((100000L, 0L), (200000L, 0L)).toDF("sm", "y")
    val out = Prep.thresholdSweep(rows, col("sm"), col("y"), steps = 4)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), Option(r.get(5)), Option(r.get(6)))).toMap
    assert(out.size == 5) // every threshold present, even empty ones
    assert(out(1.0)._1 == 0L && out(1.0)._2.isEmpty) // prec NULL at 0 pred
    assert(out(0.0)._3.isEmpty) // recall NULL: no positives exist
  }

  test("psiDrift: identical cohorts score 0, dense grid, hand value") {
    // group g: A = {b0, b0, b1}, B = {b0, b1, b1} over 4 buckets.
    // Shares: pA = (2+1)/7, (1+1)/7, 1/7, 1/7; pB mirrors buckets 0/1.
    // PSI = Σ (pA−pB)·ln(pA/pB) = 2·(1/7)·ln(3/2) rounded per-bucket.
    val rows = Seq(
      ("g", 0L, 1L, 0L), ("g", 0L, 1L, 0L), ("g", 1L, 1L, 0L),
      ("g", 0L, 0L, 1L), ("g", 1L, 0L, 1L), ("g", 1L, 0L, 1L),
      // group h: identical cohorts → every contrib 0, psi 0
      ("h", 2L, 1L, 1L), ("h", 3L, 1L, 1L))
      .toDF("src", "bucket", "ia", "ib")
    val out = Prep.psiDrift(rows, col("src"), col("bucket"),
      col("ia"), col("ib"), buckets = 4)
    val byKey = out.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(6), r.getDouble(7))).toMap
    assert(byKey.size == 8) // dense: 2 groups × 4 buckets
    val c = Learn.round6((3.0 / 7 - 2.0 / 7) * math.log((3.0 / 7) / (2.0 / 7)))
    assert(byKey(("g", 0L))._3 == c && byKey(("g", 1L))._3 == c)
    assert(byKey(("g", 2L))._3 == 0.0 && byKey(("g", 3L))._3 == 0.0)
    assert(byKey(("g", 0L))._4 == Learn.round6(2 * c))
    assert(byKey(("h", 2L)) == ((1L, 1L, 0.0, 0.0)))
    assert(out.collect().forall(_.getDouble(6) >= 0.0)) // contribs ≥ 0
  }

  test("laplaceNoise: deterministic, scale-proportional, sign-balanced") {
    val keys = (0 until 400).map(i => s"k$i").toDF("k")
    val n1 = keys.select(col("k"),
        Prep.laplaceNoise(col("k"), "t", 1.0).as("e1"),
        Prep.laplaceNoise(col("k"), "t", 10.0).as("e10"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    // same key + salt → same draw (content-addressed), scale is linear
    assert(n1.values.forall { case (a, b) => b == a * 10.0 })
    val again = keys.select(Prep.laplaceNoise(col("k"), "t", 1.0))
      .as[Double].collect()
    assert(again.toSeq == keys.select(col("k")).as[String].collect()
      .toSeq.map(k => n1(k)._1))
    // symmetric around 0: both signs well represented, median near 0
    val vals = n1.values.map(_._1).toSeq.sorted
    val neg = vals.count(_ < 0)
    assert(neg > 120 && neg < 280, s"sign balance off: $neg/400 negative")
    assert(math.abs(vals(200)) < 0.2, s"median ${vals(200)} far from 0")
    assert(vals.forall(v => !v.isNaN && !v.isInfinite))
    // a different salt decorrelates the draw
    val other = keys.select(Prep.laplaceNoise(col("k"), "u", 1.0))
      .as[Double].collect().toSet
    assert(other != n1.values.map(_._1).toSet)
  }
}
