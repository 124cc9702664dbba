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

  test("packSequences: exact placement, straddle, zero-token drop, waste") {
    // one stream (shards=1), capacity 10: starts 0,4,14,17 → doc 2
    // straddles chunks 0-1, doc 5 straddles 1-2, doc 4 (0 tokens) drops
    val df = Seq((1L, "a", 4L), (2L, "a", 10L), (3L, "a", 3L),
      (4L, "a", 0L), (5L, "a", 8L)).toDF("id", "dom", "n")
    val got = Sampling.packSequences(df, col("id"), col("dom"), col("n"),
        capacity = 10, shards = 1)
      .select("id", "first_chunk", "chunk_offset", "last_chunk")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 0L, 0L), (2L, 0L, 4L, 1L),
      (3L, 1L, 4L, 1L), (5L, 1L, 7L, 2L)))
    val st = Sampling.packingStats(
      Sampling.packSequences(df, col("id"), col("dom"), col("n"), 10, 1),
      col("dom"), capacity = 10)
      .select("n_docs", "n_tokens", "n_chunks", "waste_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(st == Seq((4L, 25L, 3L, 5L)))
    // manifest: straddlers split into per-chunk local segments that tile
    // each chunk exactly (the trainer's loss-mask boundaries)
    val mf = Sampling.chunkManifest(
      Sampling.packSequences(df, col("id"), col("dom"), col("n"), 10, 1),
      capacity = 10)
      .select("id", "chunk", "tok_begin", "tok_len")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    assert(mf.toSeq == Seq((1L, 0L, 0L, 4L), (2L, 0L, 4L, 6L),
      (2L, 1L, 0L, 4L), (3L, 1L, 4L, 3L), (5L, 1L, 7L, 3L),
      (5L, 2L, 0L, 5L)))
  }

  test("packSequences: per-stream cumsum invariants, partition-stable") {
    val rows = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", i % 7))
    def run(part: Int) = Sampling.packSequences(
        rows.toDF("id", "dom", "n").repartition(part),
        col("id"), col("dom"), col("n"), capacity = 16, shards = 4)
      .select("id", "dom", "shard", "n_tokens", "first_chunk",
        "chunk_offset", "last_chunk").collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("dom"),
        r.getAs[Long]("shard"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("first_chunk"), r.getAs[Long]("chunk_offset"),
        r.getAs[Long]("last_chunk"))).toMap
    val got = run(3)
    // zero-token docs dropped, everything else packed exactly once
    assert(got.size == rows.count(_._3 > 0))
    // within every (dom, shard) stream the placements ARE the id-ordered
    // token cumsum (offset = start mod cap, chunks = floor divs)
    got.toSeq.groupBy { case (_, v) => (v._1, v._2) }.foreach {
      case (_, docs) =>
        var start = 0L
        docs.sortBy(_._1).foreach { case (_, v) =>
          assert(v._4 == start / 16 && v._5 == start % 16 &&
            v._6 == (start + v._3 - 1) / 16)
          start += v._3
        }
    }
    // content-addressed: identical layout regardless of partitioning
    assert(run(7) == got)
  }

  test("trainSchedule: injective global_idx, DDP rank/step, stable") {
    val df = (0L until 97L).map(i => Tuple1(i)).toDF("k")
    def run(part: Int) = Sampling.trainSchedule(df.repartition(part),
        col("k"), shards = 4, epoch = 1, worldSize = 3)
      .select("k", "shard", "pos", "global_idx", "rank", "step")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val got = run(2)
    // one slot per chunk, no collisions (shard is the residue)
    assert(got.map(_._4).distinct.size == 97)
    got.foreach { case (_, shard, pos, g, r, st) =>
      assert(g == (pos - 1) * 4 + shard)
      assert(r == g % 3 && st == g / 3)
      assert(g % 4 == shard)
    }
    // dense prefix: every slot below shards*min(shard size) is taken
    val minShard = got.groupBy(_._2).map(_._2.size).min
    val taken = got.map(_._4).toSet
    assert((0L until 4L * minShard).forall(taken))
    // content-addressed: identical schedule under any partitioning
    assert(run(7).sorted == got.sorted)
    // a different epoch deals a different order
    val e2 = Sampling.trainSchedule(df, col("k"), 4, epoch = 2,
        worldSize = 3)
      .select("k", "global_idx").as[(Long, Long)].collect().toMap
    assert(got.exists { case (k, _, _, g, _, _) => e2(k) != g })
  }

  test("uniMaxAllocation: saturated prefix + constant fair share, exact") {
    // tokens 10,20,40,80; cap 2 epochs; budget = 150*9 div 5 = 270.
    // caps 20,40,80,160; ranks 1..4: r=4 is the first where
    // cap*(nd-r+1) > budget-prefix (160*1 > 270-140) → a,b,c saturate
    // at their caps, d gets the fair share 270-140 = 130 (1.625 epochs);
    // the allocations sum to the budget exactly
    val df = Seq(("a", 10L), ("b", 20L), ("c", 40L), ("d", 80L))
      .toDF("dom", "n")
    val got = Sampling.uniMaxAllocation(df, col("dom"), col("n"),
        maxEpochs = 2, budgetNum = 9, budgetDen = 5)
      .select("dom", "n_tokens", "cap_tokens", "alloc_tokens", "epochs",
        "saturated")
      .as[(String, Long, Long, Double, Double, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 10L, 20L, 20.0, 2.0, 1L),
      ("b", 20L, 40L, 40.0, 2.0, 1L), ("c", 40L, 80L, 80.0, 2.0, 1L),
      ("d", 80L, 160L, 130.0, 1.625, 0L)))
    assert(got.map(_._4).sum == 270.0)
  }

  test("uniMaxAllocation: budget beyond all caps → everyone saturates") {
    val df = Seq(("a", 10L), ("b", 20L), ("c", 40L)).toDF("dom", "n")
    val got = Sampling.uniMaxAllocation(df, col("dom"), col("n"),
        maxEpochs = 2, budgetNum = 10, budgetDen = 1)
      .select("dom", "alloc_tokens", "epochs", "saturated")
      .as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 20.0, 2.0, 1L), ("b", 40.0, 2.0, 1L),
      ("c", 80.0, 2.0, 1L)))
  }

  test("uniMaxAllocation: partition-stable, fair share shared by tail") {
    val rows = (0L until 60L).map(i => (i, s"dom${i % 12}", i % 9 + 1))
    def run(part: Int) = Sampling.uniMaxAllocation(
        rows.toDF("id", "dom", "n").repartition(part),
        col("dom"), col("n"), maxEpochs = 3, budgetNum = 2, budgetDen = 1)
      .select("dom", "alloc_tokens", "epochs", "saturated")
      .as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
    val got = run(2)
    assert(run(7) == got)
    // every unsaturated domain gets the SAME allocation
    val fairs = got.filter(_._4 == 0L).map(_._2).distinct
    assert(fairs.size <= 1)
    // saturated domains sit exactly at cap: epochs == maxEpochs
    assert(got.filter(_._4 == 1L).forall(_._3 == 3.0))
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

  test("doremiWeights: exact-pow literal frame, λ scaling, natural mix") {
    // kl ∈ {0, 1} keeps 2^(λ·kl) exact (no libm): a = (300 tokens,
    // kl 0) → term 0.75·1 = 0.75; b = (100, kl 1) → 0.25·2 = 0.5;
    // norm 1.25 → weights 0.6 / 0.4, boosts 0.8 / 1.6
    val kl = Seq(("a", 300L, 0.0), ("b", 100L, 1.0))
      .toDF("source", "n_tokens", "kl_bits")
    val got = Sampling.doremiWeights(kl, lambda = 1.0)
      .select("source", "token_share", "weight", "boost")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 0.75, 0.6, 0.8)))
    assert(got("b") == (("b", 0.25, 0.4, 1.6)))
    // λ = 0 disables the boost: weights return to the natural shares
    val flat = Sampling.doremiWeights(kl, lambda = 0.0)
      .select("source", "weight", "boost")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(flat("a") == (("a", 0.75, 1.0)))
    assert(flat("b") == (("b", 0.25, 1.0)))
    // weights always normalize to 1 (decimal-sandwich sum is exact)
    val s = Sampling.doremiWeights(kl, lambda = 3.0)
      .agg(org.apache.spark.sql.functions.sum($"weight"))
      .as[Double].head()
    assert(math.abs(s - 1.0) < 2e-6)
  }

  test("dataConstrainedValue: R ≤ 1 passes through; decay matches the " +
      "closed form; utilization falls with epochs") {
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val eff = (r: Double) =>
      r6(1.0 + 15.39 * (1.0 - math.exp(-(r - 1.0) / 15.39)))
    val df = Seq(("a", 1000L, 0.5, 0L), ("b", 1000L, 1.0, 0L),
      ("c", 1000L, 2.0, 1L), ("d", 1000L, 16.39, 1L))
      .toDF("source", "n_tokens", "epochs", "saturated")
    val got = Sampling.dataConstrainedValue(df)
      .select("source", "eff_epochs", "effective_tokens", "utilization")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // a partial first pass is all fresh tokens: eff = R, utilization 1
    assert(got("a") == (("a", 0.5, 500.0, 1.0)))
    assert(got("b") == (("b", 1.0, 1000.0, 1.0)))
    assert(got("c")._2 == eff(2.0))
    assert(got("c")._3 == r6(1000.0 * eff(2.0)))
    // R − 1 = R*: multiplier hits 1 + R*(1 − 1/e) ≈ 10.73 of 16.39 asked
    assert(got("d")._2 == eff(16.39))
    assert(got("d")._4 < got("c")._4 && got("c")._4 < 1.0)
  }

  test("slotSampleQuantiles: determinism, with-replacement degeneracy, " +
      "bootstrap accuracy") {
    // 1..1000 uniform: true p50 = 500.5, p90 = 900.1; a 64-draw bootstrap
    // should land within a generous ~4 standard errors of truth
    val df = (1 to 1000).map(i => (i % 3, i.toLong, i.toDouble))
      .toDF("g", "id", "v")
    val out = graft.ops.Sketches.slotSampleQuantiles(
      df.where(col("g") === 0), lit("all"), col("id"), col("v"),
      Seq(0.5, 0.9), k = 64).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("n_rows") == 333L))
    val p50 = out.find(_.getAs[Double]("frac") == 0.5).get
      .getAs[Double]("est_q")
    val p90 = out.find(_.getAs[Double]("frac") == 0.9).get
      .getAs[Double]("est_q")
    // group is 3,6,...,999: true p50 ~ 501, p90 ~ 900; 4 SE ~ 250/90
    assert(math.abs(p50 - 501.0) < 250, s"p50 estimate off: $p50")
    assert(math.abs(p90 - 900.0) < 150, s"p90 estimate off: $p90")
    // partitioning independence: same picks under a different layout
    val again = graft.ops.Sketches.slotSampleQuantiles(
      df.where(col("g") === 0).repartition(13), lit("all"), col("id"),
      col("v"), Seq(0.5, 0.9), k = 64).collect()
    assert(out.map(_.toSeq).sortBy(_.toString).toSeq ==
      again.map(_.toSeq).sortBy(_.toString).toSeq)
    // single-row group: every slot picks the one row (with replacement),
    // so every quantile is exactly that value
    val solo = graft.ops.Sketches.slotSampleQuantiles(
      df.where(col("id") === 7), col("g"), col("id"), col("v"),
      Seq(0.5, 0.9), k = 64).collect()
    assert(solo.length == 2)
    assert(solo.forall(_.getAs[Double]("est_q") == 7.0))
    assert(solo.forall(_.getAs[Long]("n_rows") == 1L))
  }

  test("batchPadSlots: uniform slot picks, mod arithmetic, determinism") {
    val df = (1 to 45).map(i => (i.toLong, s"row$i")).toDF("k", "payload")
    val out = Sampling.batchPadSlots(df, col("k"), batch = 8)
      .orderBy("slot").collect()
    assert(out.length == 8)
    assert(out.forall(_.getAs[Long]("orig_n") == 45L))
    assert(out.forall(_.getAs[Long]("pad_len") == 3L)) // (8 - 45 % 8) % 8
    out.foreach { r =>
      val expectedUsed = if (r.getAs[Long]("slot") < 3L) 1L else 0L
      assert(r.getAs[Long]("used") == expectedUsed)
    }
    // every pick is a real key, and the draw is partitioning-independent
    val keys = (1 to 45).map(_.toString).toSet
    assert(out.forall(r => keys.contains(r.getAs[String]("pick_key"))))
    val again = Sampling.batchPadSlots(df.repartition(7), col("k"), 8)
      .orderBy("slot").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("batchPadSlots: exact multiple pads zero; empty input is benign") {
    val df = (1 to 16).map(i => Tuple1(i.toLong)).toDF("k")
    val out = Sampling.batchPadSlots(df, col("k"), batch = 8).collect()
    assert(out.forall(_.getAs[Long]("pad_len") == 0L))
    assert(out.forall(_.getAs[Long]("used") == 0L))
    val empty = Sampling.batchPadSlots(df.where(lit(false)), col("k"), 8)
      .collect()
    assert(empty.length == 8)
    assert(empty.forall(r => r.getAs[Long]("orig_n") == 0L
      && r.getAs[Long]("pad_len") == 0L && r.getAs[Long]("used") == 0L))
  }

  test("batchPadResample: count becomes a multiple of batch, pads are " +
      "whole-row copies with replacement multiplicity") {
    val df = (1 to 45).map(i => (i.toLong, s"p$i")).toDF("k", "payload")
    val padded = Sampling.batchPadResample(df, col("k"), batch = 8)
    assert(padded.columns.toSeq == df.columns.toSeq)
    val n = padded.count()
    assert(n == 48L && n % 8 == 0)
    // appended rows are exact copies: every (k, payload) pair in the
    // padded frame exists in the original, and total multiplicity of the
    // 3 picked keys is original + slot wins
    val mult = padded.groupBy("k", "payload").count()
      .where(col("count") > 1).collect()
    assert(mult.map(_.getAs[Long]("count") - 1).sum == 3L)
    mult.foreach { r =>
      assert(r.getAs[String]("payload") == s"p${r.getAs[Long]("k")}")
    }
  }
}
