package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicated-span fraction (d30), count-based percent-rank calibration
  * (d31), and the interpolated bigram LM (d32). */
class RankLmSpec extends SparkSpec {

  import spark.implicits._

  test("dupSpans: cross-doc repeats only; short docs score 0") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown cat"),
      (3L, "totally unique words here"),
      (4L, "hi there"), // < 3 tokens -> zero spans
      (5L, "rep rep rep rep rep rep")) // internal repeats, no other doc
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs 1/2 share "the quick brown": 1 of 2 spans duplicated
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
    // within-doc repetition is NOT cross-document duplication
    assert(out(5L)._2 == 0L && out(5L)._3 == 0.0)
  }

  test("groupPercentRank matches SQL percent_rank/cume_dist (with ties)") {
    val df = spark.range(300).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") % 17).cast("double").as("v"))
    val got = RankStats.groupPercentRank(df, "g", "v", "pr", "cd")
    val w = Window.partitionBy("g").orderBy("v")
    val want = df
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
    assert(got.count() == 300)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("groupPercentRank: single-row group gets percent_rank 0, cume 1") {
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val m = RankStats.groupPercentRank(df, "g", "v", "pr", "cd")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(("a", 5.0)) == ((0.0, 1.0)))
    assert(m(("b", 1.0)) == ((0.0, 0.5)))
    assert(m(("b", 2.0)) == ((1.0, 1.0)))
  }

  test("globalOrderIndex matches the naive global row_number window") {
    val df = spark.range(500).select(col("id").as("doc"),
      ((col("id") * 37) % 23).cast("double").as("score"))
    val got = RankStats.globalOrderIndex(df, "score", "doc", "r")
      .select("doc", "score", "r")
    val want = df.withColumn("r",
      row_number().over(Window.orderBy(col("score").desc, col("doc")))
        .cast("long"))
      .select("doc", "score", "r")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("cluster keeper: highest quality wins, lowest doc_id on ties") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc", "keep_id")
    val quality = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (4L, 0.5))
      .toDF("doc", "quality_score")
    val out = clusters.join(quality, Seq("doc"))
      .groupBy(col("keep_id").as("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("quality_score"), (-col("doc")).as("negdoc")))
          .as("m"))
      .select(col("cluster"), col("n_docs"),
        (-col("m.negdoc")).as("keeper_id"),
        col("m.quality_score").as("keeper_quality"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 2L, 0.9))) // docs 2,3 tie at 0.9 -> doc 2
    assert(out(4L) == ((1L, 4L, 0.5)))
  }

  test("globalCumsum equals the naive global window at any partition count") {
    val df = spark.range(1000).select(col("id").as("k"),
      ((col("id") * 13) % 97 + 1).as("v"))
    val want = df.withColumn("c",
      sum($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .select("k", "v", "c")
    for (p <- Seq(1, 7, 32)) {
      val got = Sequences.globalCumsum(df, "k", $"v", "c", partitions = p)
        .select("k", "v", "c")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"mismatch at partitions=$p")
    }
  }

  test("bigram LM: Jelinek-Mercer hand values; short docs 0 bigrams") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x"))
      .toDF("doc_id", "text")
    val fn = graft.QueriesText.defs.find(_._1 == "d32_bigram_lm").get._2
    // run the registered query body against a temp parquet dir
    val dir = s"${sys.props("java.io.tmpdir")}/graft_ranklm_docs"
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def nll(p: Double) = math.log(1.0 / p) / math.log(2.0)
    // unigrams: a=3 b=2 c=1 x=1, N=7; bigrams: "a b" cb=2, "a c" cb=1
    val p12 = 0.9 * (2.0 / 3.0) + 0.1 * (2.0 / 7.0)
    val p3 = 0.9 * (1.0 / 3.0) + 0.1 * (1.0 / 7.0)
    assert(out(1L)._1 == 1L &&
      math.abs(out(1L)._2 - nll(p12)) < 1e-5)
    assert(math.abs(out(2L)._2 - nll(p12)) < 1e-5)
    assert(math.abs(out(3L)._2 - nll(p3)) < 1e-5)
    assert(out(4L) == ((0L, 0.0)))
  }
}
