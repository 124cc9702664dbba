package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit specs for the §3.3 training slice (`pipeline/Training.scala`) —
  * the semantic traps called out in SURVEY §5.2 style, previously covered
  * only by the q88/q89 oracle rows (reference `training.ipynb cell5:L27`,
  * `cell16:L18-31`):
  *   - rankSumAuc: average-rank tie correction must match sklearn
  *     `roc_auc_score` (hand-computed literal with score ties);
  *     single-class group → NULL (sklearn raises there).
  *   - stratifiedFolds: per-stratum fold sizes differ by ≤1; the deal is
  *     deterministic for a salt and changes with it.
  *   - cvScores: every row is scored exactly once, by a model fit WITHOUT
  *     its fold (held-out disjointness), through the bridged scorer.
  */
class TrainingSpec extends SparkSpec {
  import spark.implicits._

  test("rankSumAuc matches hand-computed Mann–Whitney with tied scores") {
    // ranks asc: 0.1→1, 0.2/0.2→2.5, 0.3/0.3→4.5, 0.4→6
    // R+ = 2.5 + 4.5 + 6 = 13; AUC = (13 − 3·4/2) / (3·3) = 7/9
    val df = Seq(
      (0.1, 0L), (0.2, 0L), (0.2, 1L), (0.3, 1L), (0.3, 0L), (0.4, 1L)
    ).toDF("score", "label").withColumn("g", lit(1L))
    val r = Training.rankSumAuc(df, col("score"), col("label"), Seq("g"))
      .collect().head
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_neg") === 3L)
    assert(math.abs(r.getAs[Double]("auc") - 7.0 / 9.0) < 1e-15)
  }

  test("rankSumAuc: perfect separation → 1.0, reversed → 0.0") {
    val df = Seq((0.1, 0L), (0.2, 0L), (0.8, 1L), (0.9, 1L))
      .toDF("score", "label").withColumn("g", lit(1L))
    val auc = Training.rankSumAuc(df, col("score"), col("label"), Seq("g"))
      .collect().head.getAs[Double]("auc")
    assert(auc === 1.0)
    val rev = df.withColumn("label", lit(1L) - col("label"))
    val auc2 = Training.rankSumAuc(rev, col("score"), col("label"), Seq("g"))
      .collect().head.getAs[Double]("auc")
    assert(auc2 === 0.0)
  }

  test("rankSumAuc: single-class group is NULL (sklearn raises)") {
    val df = Seq((0.1, 1L), (0.2, 1L), (0.5, 0L), (0.6, 1L))
      .toDF("score", "label")
      // group 1 all-positive; group 2 mixed
      .withColumn("g", when(col("score") < 0.3, 1L).otherwise(2L))
    val byG = Training.rankSumAuc(df, col("score"), col("label"), Seq("g"))
      .collect().map(r => r.getAs[Long]("g") -> Option(r.get(3))).toMap
    assert(byG(1L).isEmpty)
    assert(byG(2L).isDefined)
  }

  test("stratifiedFolds: per-stratum sizes differ by ≤1; salt re-deals") {
    val df = ((1L to 10L).map(_ -> 0L) ++ (11L to 17L).map(_ -> 1L))
      .toDF("user_id", "label")
    val f = Training.stratifiedFolds(df, "user_id", "label", 3, "cv:0")
    val sizes = f.groupBy("label", "fold").count().collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("count")).toSeq.sorted).toMap
    // stratum 0 (10 rows): 3,3,4 over k=3; stratum 1 (7 rows): 2,2,3
    assert(sizes(0L) === Seq(3L, 3L, 4L))
    assert(sizes(1L) === Seq(2L, 2L, 3L))
    // deterministic for a salt
    val again = Training.stratifiedFolds(df, "user_id", "label", 3, "cv:0")
    assert(f.collect().toSet === again.collect().toSet)
    // a different salt yields a different deal
    val other = Training.stratifiedFolds(df, "user_id", "label", 3, "cv:1")
    assert(f.collect().toSet !== other.collect().toSet)
  }

  test("cvScores: each row scored once, by a model that never saw its fold") {
    // learnable 2-feature frame, k=2: fold parity determines nothing; the
    // label is sign(f1). Tiny iterations keep the fit sub-second.
    val rows = (1L to 24L).map { i =>
      val f1 = if (i % 2 == 0) 1.0 else -1.0
      (i, f1, i.toDouble / 24.0, if (f1 > 0) 1L else 0L)
    }
    val base = rows.toDF("user_id", "f1", "f2", "label")
    val m = Training.stratifiedFolds(base, "user_id", "label", 2, "cv:0")
    val cv = Training.cvScores(m, Seq("f1", "f2"), "user_id", "label",
      "fold", 2, iterations = 2)
    val got = cv.collect()
    // exactly once per input row, fold preserved from the assignment
    assert(got.length === 24)
    assert(got.map(_.getAs[Long]("user_id")).toSet === (1L to 24L).toSet)
    val foldOf = m.select("user_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(r.getAs[Long]("fold") === foldOf(r.getAs[Long]("user_id")))
      assert(!r.isNullAt(r.fieldIndex("target")))
    }
    // held-out scoring is real: a model fit on the complement of fold 0
    // reproduces cvScores' fold-0 targets bit-for-bit (bridged both ways)
    val m0 = Training.fitGbt(m.filter(col("fold") =!= 0L), Seq("f1", "f2"),
      "label", iterations = 2)
    val direct = TreeEnsembleScorer(m0).score(m.filter(col("fold") === 0L))
      .select("user_id", "target").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.filter(_.getAs[Long]("fold") == 0L).foreach { r =>
      assert(r.getAs[Double]("target") === direct(r.getAs[Long]("user_id")))
    }
  }
}
