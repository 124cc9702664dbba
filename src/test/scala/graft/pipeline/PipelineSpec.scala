package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("a", "b")

  test("featureMatrixFused produces the same matrix as the join form") {
    val df = Seq(
      (1L, "a", 10.0, 100), (1L, "a", -2.0, 200), (1L, "b", 5.0, 300),
      (2L, "a", 7.0, 400))
      .toDF("u", "code", "amt", "t")
    val joined = Pipeline.featureMatrix(df, "u", "code", "amt", $"t", vocab)
    val fused = Pipeline.featureMatrixFused(df, "u", "code", "amt", $"t",
      vocab)
    assert(joined.columns.toSeq == fused.columns.toSeq)
    val a = joined.orderBy("u").collect().map(_.toSeq)
    val b = fused.orderBy("u").collect().map(_.toSeq)
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach {
        case (xv: Double, yv: Double) => assert(math.abs(xv - yv) < 1e-9)
        case (xv, yv) => assert(xv == yv)
      }
    }
  }

  test("submission: dropped users re-enter with the max score, sorted") {
    val feats = Seq((1L, 2.0), (2L, 5.0)).toDF("u", "f")
    val all = Seq(1L, 2L, 3L).toDF("u")
    val sub = Pipeline.submission(feats,
      LinearScorer(Map("f" -> 1.0)), all, "u")
      .as[(Long, Double)].collect()
    assert(sub.toSeq == Seq((1L, 2.0), (2L, 5.0), (3L, 5.0)))
  }

  test("alignFeatures adds missing model columns as zeros, in order") {
    val df = Seq((1L, 3.0)).toDF("u", "x")
    val out = Pipeline.alignFeatures(df, "u", Seq("x", "nn_predict", "y"))
    assert(out.columns.toSeq == Seq("u", "x", "nn_predict", "y"))
    assert(out.head().toSeq == Seq(1L, 3.0, 0.0, 0.0))
  }
}
