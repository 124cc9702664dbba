package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 relevance, top-k ranking, RRF fusion, histogram-sketch quantiles,
  * and centroid-distance outliers — known-value checks small enough to
  * verify by hand. */
class RelevanceHistSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, eps: Double = 1e-6) =
    assert(math.abs(a - b) <= eps, s"$a vs $b")

  test("bm25 matches the hand-computed Okapi/Lucene formula") {
    // corpus: 3 docs, query = ["cat"]. tf: d1=2, d2=0, d3=1; lens 4,2,3
    val df = Seq(
      (1L, "cat cat dog bird"),
      (2L, "dog bird"),
      (3L, "cat dog fish")).toDF("id", "text")
    val out = Relevance.bm25(df, "id", "text", Seq("cat"))
      .orderBy("id").collect()
    val n = 3.0; val df1 = 2.0; val avgdl = 3.0
    val idf = math.log(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
    def score(tf: Double, len: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))
    approx(out(0).getAs[Double]("bm25"), score(2, 4), 1e-5)
    assert(out(1).getAs[Double]("bm25") == 0.0)
    approx(out(2).getAs[Double]("bm25"), score(1, 3), 1e-5)
    assert(out(0).getAs[Long]("n_tokens") == 4L)
  }

  test("topKRanks keeps k rows with deterministic id tiebreak") {
    val df = Seq((1L, 5.0), (2L, 7.0), (3L, 5.0), (4L, 1.0))
      .toDF("id", "sc")
    val out = Relevance.topKRanks(df, "sc", "id", 3)
      .select("id", "rank").as[(Long, Int)].collect().toMap
    assert(out == Map(2L -> 1, 1L -> 2, 3L -> 3)) // tie 1 vs 3 → id asc
  }

  test("ragContextPack: rank by exact sums, greedy budget, truncation rows") {
    // index: q-terms hit docs with integer weights; query A = {x, y},
    // query B = {y}. Doc scores for A: d1 = 10+5 = 15, d2 = 8, d3 = 7;
    // tokens d1 = 40, d2 = 50, d3 = 20 → cum 40, 90, 110: with budget
    // 100 the THIRD doc is truncated even though a later smaller doc
    // would fit — greedy is rank-order by contract, not knapsack
    val index = Seq(("x", 1L, 10L), ("x", 2L, 8L), ("y", 1L, 5L),
      ("y", 3L, 7L)).toDF("term", "doc", "weight_micro")
    val qt = Seq(("A", "x"), ("A", "y"), ("B", "y")).toDF("qid", "term")
    val tk = Seq((1L, 40L), (2L, 50L), (3L, 20L)).toDF("doc", "n_tokens")
    val out = Relevance.ragContextPack(index, qt, tk, k = 3,
        budgetTokens = 100L)
      .select("qid", "rank", "doc", "score_micro", "cum_tokens",
        "in_context")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("A", 1L, 1L, 15L, 40L, 1L), ("A", 2L, 2L, 8L, 90L, 1L),
      ("A", 3L, 3L, 7L, 110L, 0L), // visible but flagged out
      ("B", 1L, 3L, 7L, 20L, 1L), ("B", 2L, 1L, 5L, 60L, 1L)))
  }

  test("rrfFuse sums reciprocal ranks across lists") {
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val out = Relevance.rrfFuse(Seq(a, b), "id", "rank")
      .orderBy("id").collect()
    approx(out(0).getAs[Double]("rrf_score"), 1.0 / 61) // only list a
    approx(out(1).getAs[Double]("rrf_score"), 1.0 / 62 + 1.0 / 61)
    assert(out(1).getAs[Long]("n_lists") == 2L)
    assert(out(2).getAs[Long]("n_lists") == 1L)
  }

  test("histogram quantiles interpolate within the covering bin") {
    // values 1..100 in one group, 10 bins over [1,100]: width 9.9.
    // q=0.5 → target 50: bins 0..4 hold 10,10,10,10,10... bin b covers
    // [1+9.9b, 1+9.9(b+1)); counts per bin via floor arithmetic.
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("k", "v")
    val out = Histogram.quantiles(df, col("k"), col("v"), 10, Seq(0.5))
      .head()
    assert(out.getAs[Long]("n") == 100L)
    // exact median 50.5; a 10-bin sketch must land within one bin width
    val est = out.getAs[Long]("est_micros") / 1e6
    assert(math.abs(est - 50.5) <= 9.9, s"est $est")
  }

  test("histogram quantiles: degenerate range and q=1.0 clamp") {
    val flat = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0)).toDF("k", "v")
    val r = Histogram.quantiles(flat, col("k"), col("v"), 8, Seq(0.5, 1.0))
      .orderBy("q").collect()
    assert(r.length == 2)
    r.foreach(row => assert(row.getAs[Long]("est_micros") == 5000000L))
  }

  test("histogram quantiles per group use the global range") {
    val df = (Seq.fill(50)(("a", 10.0)) ++ Seq.fill(50)(("b", 90.0)))
      .toDF("k", "v")
    val out = Histogram.quantiles(df, col("k"), col("v"), 4, Seq(0.5))
      .orderBy("grp").collect()
    // group a lives entirely in the bottom bin, b in the top: estimates
    // must sit inside each group's own bin despite the shared [10,90] range
    assert(out(0).getAs[Long]("est_micros") <= 30000000L)
    assert(out(1).getAs[Long]("est_micros") >= 70000000L)
  }

  test("histogram quantile error is bounded by one bin width (deterministic corpus)") {
    // skewed-ish deterministic values: v = (i*i*2654435761L) mod 10007
    val vals = (1 to 2000).map(i => ((i.toLong * i * 2654435761L) % 10007L)
      .toDouble.abs)
    val df = vals.map(("g", _)).toDF("k", "v")
    val bins = 64
    val binW = (vals.max - vals.min) / bins
    val sorted = vals.sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = Histogram.quantiles(df, col("k"), col("v"), bins, Seq(q))
        .head().getAs[Long]("est_micros") / 1e6
      // exact order statistic at ceil(q*n): the value the cumulative-count
      // definition targets
      val exact = sorted(math.min(vals.size - 1,
        math.max(0, math.ceil(q * vals.size).toInt - 1)))
      assert(math.abs(est - exact) <= binW + 1e-9,
        s"q=$q est=$est exact=$exact binW=$binW")
    }
  }

  test("histogram sketch merges: per-half bin counts sum to the full sketch") {
    // mergeability is what makes the sketch a sketch: counts from disjoint
    // partitions combine by addition (that IS the groupBy), so a
    // distributed/partial aggregation is exact, not approximate-on-top
    val all = (1 to 1000).map(i => ("g", i.toDouble)).toDF("k", "v")
    val full = Histogram.quantiles(all, col("k"), col("v"), 16, Seq(0.5))
      .head().getAs[Long]("est_micros")
    val shuffled = all.repartition(13) // arbitrary re-partitioning
    val re = Histogram.quantiles(shuffled, col("k"), col("v"), 16, Seq(0.5))
      .head().getAs[Long]("est_micros")
    assert(full == re, s"partitioning changed the sketch: $full vs $re")
  }

  test("centroidDistances flags the planted outlier") {
    val mk = (v: Double) => Array.fill(4)(v.toFloat)
    val df = Seq(
      (1L, mk(1.0), 0), (2L, mk(1.1), 0), (3L, mk(0.9), 0),
      (4L, mk(9.0), 0), // planted far-out vector, same label
      (5L, mk(5.0), 1), (6L, mk(5.0), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDistances(df, "vec_id", "embedding", "label")
      .orderBy("vec_id").collect()
    assert(out.map(_.getAs[Long]("is_outlier")).toSeq ==
      Seq(0L, 0L, 0L, 1L, 0L, 0L))
    // label-1 pair is symmetric: both sit AT the centroid
    approx(out(4).getAs[Double]("dist2"), 0.0)
    approx(out(5).getAs[Double]("dist2"), 0.0)
    // centroid of label 0 = mean(1, 1.1, 0.9, 9) = 3.0 per component;
    // dist2 of vec 1 = 4 * (1-3)^2 = 16
    approx(out(0).getAs[Double]("dist2"), 16.0, 1e-4)
  }

  test("LSH index tables are append-incremental: append equals rebuild") {
    // Signatures are PER-ROW projections against literal planes — no
    // corpus-global state — so indexing a delta batch and unioning it
    // onto the standing index is EXACTLY the index a full rebuild
    // produces: the ANN-side analog of q61/q63's incremental
    // maintenance (new corpus shards index in isolation; nothing is
    // ever recomputed).
    val mk = (id: Long) =>
      (id, Array.tabulate(4)(i => math.sin(id * 3.7 + i).toFloat))
    val base = (1L to 8L).map(mk).toDF("id", "vec")
    val delta = (9L to 12L).map(mk).toDF("id", "vec")
    def index(df: org.apache.spark.sql.DataFrame) =
      Similarity.lshIndexTable(df, dims = 4, planes = 8, bands = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("band", "bits", "nid", "_nn")
        .as[(Int, Long, Long, Double)].collect().toSet
    val appended = index(base).union(index(delta))
    val rebuilt = index(base.union(delta))
    assert(rows(appended) == rows(rebuilt))
    // and queries against the appended index return the rebuild's answer
    val q = (1L to 2L).map(mk).toDF("id", "vec")
    def ans(ix: org.apache.spark.sql.DataFrame) =
      Similarity.lshKnnIndexed(q, ix, k = 3, dims = 4, planes = 8,
        bands = 2).as[(Long, Long, Long, Double)].collect().toSet
    assert(ans(appended) == ans(rebuilt))
  }

  test("nearestCentroid reclassifies the planted mislabel") {
    val mk = (v: Double) => Array.fill(4)(v.toFloat)
    val df = Seq(
      (1L, mk(1.0), 0), (2L, mk(1.2), 0), (3L, mk(0.8), 0),
      (4L, mk(5.0), 1), (5L, mk(5.2), 1),
      (6L, mk(5.1), 0)) // label says 0, sits in cluster 1
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.nearestCentroid(df, "vec_id", "embedding", "label")
      .orderBy("vec_id").collect()
    // label-0 centroid = mean(1, 1.2, .8, 5.1) = 2.025; label-1 = 5.1.
    // vectors 1-3 stay at label 0; 4-5 at label 1; the planted vec 6
    // (labeled 0, value 5.1) is EXACTLY the label-1 centroid -> pred 1.
    assert(out.map(r => (r.getAs[Int]("pred_label"),
      r.getAs[Long]("correct"))).toSeq ==
      Seq((0, 1L), (0, 1L), (0, 1L), (1, 1L), (1, 1L), (1, 0L)))
    approx(out(5).getAs[Double]("d2_pred"), 0.0)
  }
}
