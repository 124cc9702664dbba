package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Crafted-input checks for the sketch / weighted-sampling / TF-IDF
  * operators (d19–d21). The driver's DuckDB oracle checks them at data
  * scale; these pin the estimator math and the integer-exact selection
  * semantics. */
class SketchSampleSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct is exact below k and ~13% at k=64") {
    val df = (1 to 5000).map(i =>
      (if (i <= 10) "small" else "big", i.toLong)).toDF("g", "v")
    val out = Sketches.kmvDistinct(df, col("g"), col("v"), k = 64)
      .orderBy("grp").collect()
    val big = out(0)
    val small = out(1)
    // below k the sketch holds every hash → estimate == exact count
    assert(small.getAs[Long]("n_exact") == 10L)
    assert(small.getAs[Double]("est_distinct") == 10.0)
    // 4990 distinct at k=64: SE ≈ 1/sqrt(62) ≈ 12.7%; assert 4 sigma
    assert(big.getAs[Long]("n_exact") == 4990L)
    val est = big.getAs[Double]("est_distinct")
    assert(est > 4990 * 0.5 && est < 4990 * 1.5, s"KMV estimate $est")
  }

  test("kmvDistinct is deterministic across runs and partitionings") {
    val df = (1 to 1000).map(i => ("g", i.toLong)).toDF("g", "v")
    val a = Sketches.kmvDistinct(df.repartition(7), col("g"), col("v"), 32)
      .collect()(0).getAs[Double]("est_distinct")
    val b = Sketches.kmvDistinct(df.repartition(2), col("g"), col("v"), 32)
      .collect()(0).getAs[Double]("est_distinct")
    assert(a == b)
  }

  test("hllDistinct: linear counting is tight below 2.5m, ~13% at scale") {
    val df = (1 to 6000).map(i =>
      (if (i <= 40) "small" else "big", i.toLong)).toDF("g", "v")
    val out = Sketches.hllDistinct(df, col("g"), col("v"), p = 6)
      .orderBy("grp").collect()
    val big = out(0)
    val small = out(1)
    assert(small.getAs[Long]("n_exact") == 40L)
    // 40 distinct over 64 registers → linear counting regime: loose bound,
    // the point is the correction branch fires and stays in the ballpark
    val se = small.getAs[Double]("est_distinct")
    assert(se > 20 && se < 70, s"HLL small estimate $se")
    // 5960 distinct, m=64: SE ≈ 1.04/8 = 13%; assert ~4 sigma
    assert(big.getAs[Long]("n_exact") == 5960L)
    val be = big.getAs[Double]("est_distinct")
    assert(be > 5960 * 0.5 && be < 5960 * 1.5, s"HLL big estimate $be")
  }

  test("hllDistinct is deterministic across partitionings") {
    val df = (1 to 3000).map(i => ("g", i.toLong)).toDF("g", "v")
    val a = Sketches.hllDistinct(df.repartition(7), col("g"), col("v"))
      .collect()(0).getAs[Double]("est_distinct")
    val b = Sketches.hllDistinct(df.repartition(2), col("g"), col("v"))
      .collect()(0).getAs[Double]("est_distinct")
    assert(a == b)
  }

  test("hll registers max-merge across shards into the corpus sketch") {
    val df = (1 to 2000).map(i => ("g", i.toLong)).toDF("g", "v")
    val shardA = df.filter($"v" % 2 === 0)
    val shardB = df.filter($"v" % 2 =!= 0)
    val merged = Sketches.hllRegisters(shardA, col("g"), col("v"), p = 6)
      .union(Sketches.hllRegisters(shardB, col("g"), col("v"), p = 6))
      .groupBy($"grp", $"j").agg(max($"mj").as("mj"))
    val full = Sketches.hllRegisters(df, col("g"), col("v"), p = 6)
    assert(merged.as[(String, Long, Int)].collect().toSet ==
      full.as[(String, Long, Int)].collect().toSet)
    val estM = Sketches.hllFromRegisters(merged, 6)
      .collect()(0).getAs[Double]("est_distinct")
    val estF = Sketches.hllFromRegisters(full, 6)
      .collect()(0).getAs[Double]("est_distinct")
    assert(estM == estF)
  }

  test("countMin never underestimates; wide sketch is collision-free exact") {
    val vals = (1 to 2000).map(i => s"v${i % 37}").toDF("x")
    val narrow = Sketches.countMin(vals, col("x"), depth = 4, width = 8)
      .collect()
    assert(narrow.length == 37)
    narrow.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"CMS underestimated: $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // width >> distinct values: still not guaranteed collision-free, but
    // the min over 4 independent rows is exact unless a value collides in
    // ALL rows — vanishingly unlikely at 37/4096; assert exactness
    val wide = Sketches.countMin(vals, col("x"), depth = 4, width = 4096)
      .collect()
    wide.foreach(r => assert(r.getLong(2) == r.getLong(1)))
  }

  test("prioritySample keeps k per group, deterministically, weight-biased") {
    // weight 3 for ids 0..49, weight 1 for 50..149; k=30 of 150
    val df = (0L until 150L).map(i => (i, if (i < 50) 3L else 1L))
      .toDF("id", "w").withColumn("g", lit("all"))
    def run() = Sampling.prioritySample(df, col("g"), col("id"), col("w"),
      lcm = 6, k = 30).select("id", "w", "priority").collect()
    val out = run()
    assert(out.length == 30)
    assert(out.map(_.getAs[Long]("id")).toSet == run()
      .map(_.getAs[Long]("id")).toSet) // stable
    // heavy third (50 of 150 ids) should take well over a third of the
    // sample: P(weight-3 row beats weight-1 row) = 3/4 pairwise
    val heavy = out.count(_.getAs[Long]("w") == 3L)
    assert(heavy > 10, s"only $heavy weight-3 rows of 30")
    // priority really is h*6 div w — integer, no float surface
    val h = Dedup.md5Hash(lit("7").cast("string"), lit("wps"))
    val expect = df.sparkSession.range(1)
      .select((h * 6L).as("p")).collect()(0).getAs[Long]("p") / 3L
    val got = out.find(_.getAs[Long]("id") == 7L)
      .map(_.getAs[Long]("priority"))
    got.foreach(p => assert(p == expect))
  }

  test("groupSample draws exactly min(n, |group|), stable under repartition") {
    val df = (0L until 100L).map(i => (i, if (i < 80) "big" else "small"))
      .toDF("id", "g")
    def ids(part: Int) = Sampling.groupSample(
      df.repartition(part), col("g"), col("id"), n = 25)
      .select("id").as[Long].collect().toSet
    val out = Sampling.groupSample(df, col("g"), col("id"), n = 25)
      .select("g", "id", "rank").collect()
    val byG = out.groupBy(_.getAs[String]("g"))
    assert(byG("big").length == 25)        // capped at n
    assert(byG("small").length == 20)      // whole group when |group| < n
    // ranks are 1..count within each group
    assert(byG("small").map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to 20L))
    // content-addressed: identical draw regardless of partitioning
    assert(ids(1) == ids(7))
  }

  test("epochShuffle: a permutation per shard, epoch-varying, stable") {
    val df = (0L until 200L).map(i => (i, s"t$i")).toDF("id", "t")
    def run(epoch: Int, part: Int) = Sampling.epochShuffle(
      df.repartition(part), col("id"), shards = 4, epoch = epoch)
      .select("id", "shard", "pos").collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap
    val e1 = run(1, 3)
    // every row appears exactly once; positions are 1..|shard| per shard
    assert(e1.size == 200)
    e1.values.groupBy(_._1).foreach { case (_, ps) =>
      assert(ps.map(_._2).toSeq.sorted == (1L to ps.size)) }
    // content-addressed: identical layout regardless of partitioning
    assert(run(1, 7) == e1)
    // a new epoch re-permutes (some row must move shard or position)
    assert(run(2, 3) != e1)
  }

  test("epochReplicate: floor copies guaranteed, frac share extra, exact") {
    val df = (0L until 1000L).map(i =>
      (i, if (i < 500) "hi" else "lo")).toDF("id", "dom")
    val out = Sampling.epochReplicate(df, col("id"), col("dom"),
      Map("hi" -> 2.5, "lo" -> 0.4))
      .select("id", "dom", "copy").collect()
    val byId = out.groupBy(_.getAs[Long]("id")).view
      .mapValues(_.map(_.getAs[Long]("copy")).sorted.toSeq).toMap
    val hiCounts = (0L until 500L).map(i => byId.getOrElse(i, Nil).size)
    val loCounts = (500L until 1000L).map(i => byId.getOrElse(i, Nil).size)
    // hi: every doc 2 or 3 copies, copy indexes dense from 1
    assert(hiCounts.forall(c => c == 2 || c == 3))
    byId.foreach { case (_, cs) => assert(cs == (1L to cs.size)) }
    // lo: 0 or 1 copies
    assert(loCounts.forall(c => c == 0 || c == 1))
    // the md5 uniform is uniform: shares land near the frac targets
    assert(math.abs(hiCounts.count(_ == 3) / 500.0 - 0.5) < 0.08)
    assert(math.abs(loCounts.count(_ == 1) / 500.0 - 0.4) < 0.08)
    // determinism across partitionings (multiset equality via full rows)
    val again = Sampling.epochReplicate(df.repartition(9), col("id"),
      col("dom"), Map("hi" -> 2.5, "lo" -> 0.4))
      .select("id", "dom", "copy").collect()
    assert(again.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      out.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sorted.toSeq)
  }

  test("epochReplicate: unknown domains — default drop, carry, or strict error") {
    val df = Seq((1L, "en"), (2L, "xx"), (3L, "en")).toDF("id", "dom")
    val mix = Map("en" -> 2.0)
    // default: unknown domain gets 0 epochs (dropped, the inner-join form)
    val dropped = Sampling.epochReplicate(df, col("id"), col("dom"), mix)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(dropped == Set(1L, 3L))
    // defaultEpochs carries unknowns through at the given weight
    val kept = Sampling.epochReplicate(df, col("id"), col("dom"), mix,
      defaultEpochs = 1.0)
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    // strictDomains surfaces the typo'd mix table instead of deleting data
    val err = intercept[Exception] {
      Sampling.epochReplicate(df, col("id"), col("dom"), mix,
        strictDomains = true).collect()
    }
    assert(err.getMessage.contains("domain not in mix table") ||
      Option(err.getCause).exists(
        _.getMessage.contains("domain not in mix table")))
  }

  test("tfidf matches the smoothed sklearn form on a crafted corpus") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry")).toDF("doc_id", "text")
    val out = TextOps.tfidf(df, "doc_id", TextOps.tokens(col("text")))
      .orderBy("doc_id", "term").collect()
    def w(tf: Long, dfc: Long): Double = {
      val raw = tf * (math.log((2.0 + 1.0) / (dfc.toDouble + 1.0)) + 1.0)
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    val m = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
      (r.getAs[Long]("tf"), r.getAs[Long]("df_count"),
        r.getAs[Double]("tfidf"))).toMap
    assert(m((1L, "apple")) == ((2L, 1L, w(2, 1))))
    assert(m((1L, "banana")) == ((1L, 2L, w(1, 2))))
    assert(m((2L, "cherry")) == ((1L, 1L, w(1, 1))))
    assert(out.length == 4)
  }
}
