package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * E3 + A13: bootstrap resampling for prediction smoothing
 * (reference `model.py:279-281`: ×50 `df.sample(frac=0.95, replace=True,
 * random_state=seed+i)`, then per-user mean over the runs, `model.py:293`).
 *
 * Spark's with-replacement sample is per-row Poisson — statistically
 * equivalent to pandas' exact-count draw but not row-identical, and fully
 * distributed (no global shuffle, no driver collect). Document, don't fight
 * it (SURVEY.md §2.8 E3).
 */
object Sampling {

  def bootstrap(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = true, fraction, seed)

  /** The ×k ensemble union, tagged by run id; downstream takes
    * groupBy(key).avg (A13). */
  def bootstrapRuns(df: DataFrame, k: Int, fraction: Double, seed: Long): DataFrame = {
    (0 until k).map(i => bootstrap(df, fraction, seed + i)
      .withColumn("run_id", lit(i))).reduce(_ unionByName _)
  }

  /** Cumulative Poisson(lambda) CDF values P(X <= i) for i = 0..kMax-1 —
    * the inverse-CDF thresholds for [[deterministicBootstrapRuns]]. Exposed
    * so an external oracle can embed the EXACT same double literals
    * (Double.toString round-trips bit-exactly through any IEEE-754 parser). */
  def poissonThresholds(lambda: Double, kMax: Int): Seq[Double] = {
    var pmf = math.exp(-lambda)
    var cum = pmf
    (0 until kMax).map { i =>
      if (i > 0) { pmf = pmf * lambda / i; cum += pmf }
      cum
    }
  }

  /** 60-bit-md5-derived uniform in [0, 1): `u = md5Hash(key#run) / 2^60`.
    * Division by a power of two is exact, so u is bit-identical in any
    * engine that reproduces the md5 trick (DuckDB:
    * `('0x'||substr(md5(key||'#'||run),1,15))::BIGINT / 1152921504606846976.0`). */
  def hashUniform(key: Column, run: Column): Column =
    Dedup.md5Hash(key.cast("string"), run) / lit(1152921504606846976.0)

  /** Inverse-CDF replication count from a uniform: count = the number of
    * thresholds at or below u (CASE u < t0 -> 0, u < t1 -> 1, ..., else kMax). */
  def inverseCdfCount(u: Column, thresholds: Seq[Double]): Column =
    thresholds.zipWithIndex.foldRight(lit(thresholds.size): Column) {
      case ((t, i), elseC) => when(u < t, i).otherwise(elseC)
    }

  /** Deterministic train/test/fold assignment: fold = 60-bit md5 of the
    * key mod k. Content-addressed, so the split is stable across runs,
    * engines, partitionings and re-ingests — the property a reproducible
    * training pipeline needs from its splits (seeded RNG splits lose it
    * the moment row order changes). Pure projection, no shuffle. */
  def hashFold(key: Column, k: Int, salt: String = "fold"): Column =
    (Dedup.md5Hash(key.cast("string"), lit(salt)) % k).cast("long")

  /** Deterministic per-group FIXED-COUNT sample: rank each group's rows
    * by content-addressed hash (then by key, so a 60-bit hash collision
    * can't make the cut nondeterministic) and keep the first `n` — "10
    * example docs per source", the eval-set / spot-check shape that
    * rate-based [[stratifiedKeep]] can't express (a rate gives a
    * BINOMIAL count per group; this gives exactly min(n, |group|)).
    * Content-addressed like the other samplers: the same rows are kept
    * across runs, engines and partitionings. Appends (or overwrites) a
    * 1-based `rank` column with each row's position in its group's draw.
    * Scale shape: the rank filter is a `row_number` ≤ n, which Catalyst
    * pushes into the sort as WindowGroupLimit (same as q24's top-k) —
    * per-task state is n rows per group, never the group. */
  def groupSample(df: DataFrame, group: Column, key: Column, n: Int,
                  salt: String = "gsamp"): DataFrame = {
    require(n > 0, "groupSample: n must be positive")
    val w = Window.partitionBy(group)
      .orderBy(Dedup.md5Hash(key.cast("string"), lit(salt)), key)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .withColumn("rank", col("_rn").cast("long")).drop("_rn")
  }

  /** Deterministic stratified subsampling: keep a row iff its md5-derived
    * uniform is below the stratum's rate. Replays exactly in any engine
    * with md5 (same trick as the bootstrap); no shuffle, no RNG state,
    * and the kept set is stable under reordering and re-ingestion. */
  def stratifiedKeep(df: DataFrame, key: Column, stratum: Column,
                     rates: Map[String, Double],
                     salt: String = "strat"): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, r)) => when(stratum === s, r).otherwise(acc)
    }
    df.filter(hashUniform(key, lit(salt)) < rate)
  }

  /** Domain-mixture subsampling: re-weight a corpus toward a target domain
    * mix (the data-mixing step of LLM training pipelines). Each domain's
    * keep rate is `frac × targetShare(domain) / actualShare(domain)`,
    * capped at 1, where targetShare ∝ `weightOf(domain)`; rows keep iff
    * their content-addressed md5 uniform is below the domain's rate — so
    * the sample is deterministic, engine-independent and stable under
    * reordering (no RNG state).
    *
    * Scale shape: domain statistics are ONE aggregation (domains are
    * few — sources, languages, buckets), shipped back via broadcast joins;
    * the corpus itself sees a single linear filter pass, no corpus-wide
    * shuffle. Rates round to 6 dp on the exact integer-derived doubles, so
    * an external engine replays the keep set bit-for-bit. */
  def domainMix(df: DataFrame, key: Column, domain: Column,
                weightOf: Column => Column, frac: Double,
                salt: String = "mix"): DataFrame = {
    val counts = df.groupBy(domain.as("_dom"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_w", weightOf(col("_dom")).cast("double"))
    val tot = counts.agg(sum(col("_cnt")).cast("double").as("_total"),
      sum(col("_w")).as("_sumw"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate", least(lit(1.0), graft.ops.CrossRound.round(
        lit(frac) * col("_w") * col("_total")
          / (col("_sumw") * col("_cnt").cast("double")), 6)))
      .select(col("_dom"), col("rate"))
    df.join(broadcast(rates), domain === col("_dom"))
      .filter(hashUniform(key, lit(salt)) < col("rate"))
      .drop("_dom")
  }

  /** [[domainMix]] with the weight derived from the domain's observed
    * COUNT — the temperature-sampling form (Lample & Conneau 2019 §3.1):
    * w = cnt^(1/T), T > 1 flattens the mix toward uniform so
    * low-resource domains are upsampled relative to their share. Same
    * one-aggregation + broadcast-rates + linear-filter shape as
    * domainMix. For T = 2 pass `sqrt` — correctly rounded in IEEE-754,
    * so the oracle replays the rates bit-for-bit; arbitrary T needs
    * pow(), whose last ulp is libm-specific (the 6-dp rate round then
    * absorbs it in practice but not by construction). */
  def domainMixByCount(df: DataFrame, key: Column, domain: Column,
                       weightOfCount: Column => Column, frac: Double,
                       salt: String = "mix"): DataFrame = {
    val counts = df.groupBy(domain.as("_dom"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_w", weightOfCount(col("_cnt").cast("double")))
    val tot = counts.agg(sum(col("_cnt")).cast("double").as("_total"),
      sum(col("_w")).as("_sumw"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate", least(lit(1.0), graft.ops.CrossRound.round(
        lit(frac) * col("_w") * col("_total")
          / (col("_sumw") * col("_cnt").cast("double")), 6)))
      .select(col("_dom"), col("rate"))
    df.join(broadcast(rates), domain === col("_dom"))
      .filter(hashUniform(key, lit(salt)) < col("rate"))
      .drop("_dom")
  }

  /** Weighted priority sampling (Duffield–Lund–Thorup shape): per group,
    * keep the k rows with the smallest priority u/w, where u is the
    * content-addressed md5 uniform and w an integer weight — selection
    * probability grows with weight, and the kept set is stable under
    * reordering/re-ingestion like every sampler here.
    *
    * Determinism is INTEGER-exact: for weights dividing `lcm`
    * (e.g. w ∈ {1,2,3}, lcm 6), rank by h·lcm DIV w — pure 64-bit
    * arithmetic, so no cross-engine pow/log last-bit flip can ever move
    * the selection boundary (the float form u^(1/w) of Efraimidis–
    * Spiliotis cannot make that guarantee). h·lcm must stay under 2^63:
    * the 60-bit hash allows lcm ≤ 7. Ties (floor collisions) break on the
    * key, deterministically.
    *
    * Scale shape: projection + one per-group top-k window — the same
    * single-exchange pattern as q24; no corpus-wide sort. */
  def prioritySample(df: DataFrame, group: Column, key: Column,
                     weight: Column, lcm: Int, k: Int,
                     salt: String = "wps"): DataFrame = {
    require(lcm >= 1 && lcm <= 7, s"lcm=$lcm would overflow h*lcm past 2^63")
    val pri = expr(s"_h * $lcm div _w")
    val byPriority = Window.partitionBy(col("_grp"))
      .orderBy(col("priority").asc, col("_key").asc)
    // a null/zero weight would make the priority NULL, and ASC NULLS FIRST
    // would hand those rows the sample slots — fail loudly instead
    val wGuarded = {
      val w = weight.cast("long")
      when(w >= 1L, w).otherwise(raise_error(concat(
        lit("prioritySample: weight must be >= 1, got "), w.cast("string"))))
    }
    df.withColumn("_grp", group)
      .withColumn("_key", key)
      .withColumn("_h", Dedup.md5Hash(key.cast("string"), lit(salt)))
      .withColumn("_w", wGuarded)
      .withColumn("priority", pri)
      .withColumn("_rn", row_number().over(byPriority))
      .filter(col("_rn") <= k)
      .drop("_grp", "_key", "_h", "_rn")
  }

  /** Deterministic epoch shuffle: the global training-order shuffle a
    * corpus needs before each pass, without any RNG state. Each row gets a
    * content-addressed (shard, pos): shard = 60-bit md5 of the key mod
    * `shards`, pos = rank within the shard by a SECOND independent hash
    * (then by key, so a hash collision can't make the order
    * nondeterministic). Readers consume shards round-robin — the standard
    * sharded-shuffle consumption order; a NEW epoch (different `epoch`
    * value → different salts) re-permutes everything.
    *
    * Scale shape: the only exchange is the window's hash partition on
    * `shards` keys — never a global single-task sort. A 100 TB corpus at
    * shards = O(executors × few) keeps every partition pipeline-sized;
    * contrast with `orderBy(hash)`, whose range partitioner must sample
    * globally, or zipWithIndex, which serializes on a driver count. Stable
    * across runs, engines and partitionings like every content-addressed
    * op here. */
  def epochShuffle(df: DataFrame, key: Column, shards: Int, epoch: Int,
                   salt: String = "shuf"): DataFrame = {
    require(shards >= 1, "epochShuffle: shards must be positive")
    val es = s"$salt$epoch"
    val w = Window.partitionBy(col("shard"))
      .orderBy(Dedup.md5Hash(key.cast("string"), lit(s"$es.p")), key)
    df.withColumn("shard",
        (Dedup.md5Hash(key.cast("string"), lit(s"$es.s")) % shards)
          .cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Fractional-epoch replication: the "epochs per domain" data-mix form
    * (domain weight 2.5 → every doc appears twice, and a deterministic 50%
    * of docs a third time; weight 0.4 → no guaranteed copy, 40% of docs
    * appear once). One operator covers up- AND down-sampling: copies =
    * floor(w) + (u < frac(w)), u the content-addressed md5 uniform — so
    * the replicated multiset is stable across runs, engines and
    * partitionings, and E[copies] = w exactly.
    *
    * Emits one row per copy with a 1-based `copy` index (distinct rows, so
    * downstream exact-dedup doesn't silently undo the upsampling; shuffle
    * the result with [[epochShuffle]] on (key, copy) to interleave copies).
    * Scale shape: broadcast when-chain for the per-domain constants + one
    * generator projection (`explode(sequence)`) — no shuffle, expansion
    * proportional to the target epochs by construction.
    *
    * `fracThreshold` exposes the exact per-domain threshold doubles
    * (`w - floor(w)`) so an external oracle embeds the same literals
    * (Double.toString round-trips bit-exactly, the poissonThresholds
    * discipline). */
  def fracThreshold(epochs: Double): Double = epochs - math.floor(epochs)

  /** `defaultEpochs` is the weight for rows whose domain is NOT in
    * `epochsOf`. The default 0.0 keeps the data-mix convention (a domain
    * absent from the mix table gets no epochs, i.e. is dropped — the same
    * semantics as an inner join against the mix table); pass e.g. 1.0 to
    * carry unknown domains through unchanged. `strictDomains = true`
    * instead makes an unknown domain a RUNTIME ERROR (`raise_error` in the
    * fallback branch), for call sites where a domain outside the table
    * means a typo'd mix config rather than intentional exclusion — silent
    * data deletion is the failure mode this flag exists to catch. */
  def epochReplicate(df: DataFrame, key: Column, domain: Column,
                     epochsOf: Map[String, Double],
                     salt: String = "rep",
                     defaultEpochs: Double = 0.0,
                     strictDomains: Boolean = false): DataFrame = {
    require(epochsOf.values.forall(w => w >= 0.0 && w <= 100.0),
      "epochReplicate: epochs per domain must be in [0, 100]")
    require(defaultEpochs >= 0.0 && defaultEpochs <= 100.0,
      "epochReplicate: defaultEpochs must be in [0, 100]")
    def unknown(asDouble: Boolean): Column =
      if (strictDomains)
        raise_error(concat(lit("epochReplicate: domain not in mix table: "),
          domain.cast("string"))).cast(if (asDouble) "double" else "long")
      else if (asDouble) lit(fracThreshold(defaultEpochs))
      else lit(math.floor(defaultEpochs).toLong)
    val whole = epochsOf.toSeq.sortBy(_._1).foldLeft(unknown(asDouble = false)) {
      case (acc, (dom, w)) =>
        when(domain === dom, math.floor(w).toLong).otherwise(acc)
    }
    val frac = epochsOf.toSeq.sortBy(_._1).foldLeft(unknown(asDouble = true)) {
      case (acc, (dom, w)) =>
        when(domain === dom, fracThreshold(w)).otherwise(acc)
    }
    val extra = when(hashUniform(key, lit(salt)) < frac, 1L).otherwise(0L)
    df.withColumn("n_copies", whole + extra)
      .filter(col("n_copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }

  /** E3, DETERMINISTIC form: bootstrap-with-replacement where each row's
    * replication count in run `r` is the inverse Poisson(lambda) CDF of an
    * md5-derived uniform over (key, r) — the same per-row Poisson model
    * Spark's seeded `sample(withReplacement)` draws from, but with the
    * randomness derived from DATA instead of RNG state, so any engine can
    * replay it bit-for-bit (the trick that made the e02/e04 ANN oracles
    * exact). Rows with count 0 drop out via explode of an empty array; no
    * shuffle, no driver round-trip — a pure projection + generator, same
    * scale shape as Spark's native sampler. */
  def deterministicBootstrapRuns(df: DataFrame, key: Column, runs: Int,
                                 lambda: Double, kMax: Int = 8): DataFrame = {
    val thresholds = poissonThresholds(lambda, kMax)
    val u = hashUniform(key, col("run_id"))
    df.withColumn("run_id", explode(array((0 until runs).map(lit): _*)))
      .withColumn("_cnt", inverseCdfCount(u, thresholds))
      .withColumn("_dup", explode(array_repeat(lit(1), col("_cnt"))))
      .drop("_cnt", "_dup")
  }
}
