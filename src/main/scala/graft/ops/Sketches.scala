package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * Distinct-count sketching for corpus-scale cardinality questions
 * ("how many unique users/URLs/tokens per segment?") where an exact
 * `countDistinct` would shuffle every distinct value.
 *
 * KMV (k-minimum-values, Bar-Yossef et al. 2002): per group keep the k
 * smallest hash values of the distinct inputs; with the k-th smallest
 * normalized hash u_k, the estimator is (k−1)/u_k. Standard error
 * ≈ 1/√(k−2) — k=64 gives ~13%, k=1024 ~3%.
 *
 * Determinism: ranking uses the INTEGER 60-bit md5 hash only (exact in any
 * engine — same family as the ANN/bootstrap oracles); floating point enters
 * solely in the final estimate division, rounded cross-engine. Spark's
 * native `approx_count_distinct` (HLL++) is the production alternative but
 * its hash/merge internals are not replayable in an external oracle.
 *
 * Scale shape: TWO-PHASE top-k, because a single per-group window would
 * drag every distinct hash of a group onto one partition (the classic
 * top-k skew). Phase 1 buckets by h mod B and keeps the k smallest per
 * (group, bucket) — one exchange on (group, bucket), wide, with the
 * dedup aggregation riding the same distribution. Phase 2 ranks the
 * ≤ B·k survivors per group — its exchange moves only sketch-sized data.
 * The union of bucket top-ks contains the global top-k exactly (every
 * global winner wins its bucket), so the two-phase form is not an
 * approximation.
 */
object Sketches {

  /** Per-group distinct-count estimate via KMV. Output:
    * (grp, n_exact, est_distinct); groups with fewer than k distinct
    * values are exact by construction (the sketch holds them all).
    * `withExact` keeps the exact `countDistinct` alongside for error
    * inspection — a production pipeline at sketch-worthy scale drops it
    * (that is the whole point of the sketch). */
  def kmvDistinct(df: DataFrame, group: Column, value: Column,
                  k: Int, salt: String = "kmv",
                  buckets: Int = 64, withExact: Boolean = true): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // (k-1) * 2^60: both factors and the product are exactly representable
    // doubles for any sane k, so the numerator folds identically everywhere
    val num = (k - 1).toDouble * 1.152921504606846976e18
    val hashed = df
      .select(group.as("grp"), Dedup.md5Hash(value.cast("string"), lit(salt))
        .as("h"))
      // null values hash to null; drop them so the sketch matches
      // countDistinct semantics (nulls aren't values) — and so Spark's
      // NULLS-FIRST window order can't seat a null at rank 1
      .filter(col("h").isNotNull)
      .withColumn("_b", pmod(col("h"), lit(buckets.toLong)))
      // one wide exchange; the dedup aggregate and the phase-1 window both
      // ride this (grp, bucket) distribution — no further full-data shuffle
      .repartition(col("grp"), col("_b"))
      .groupBy(col("grp"), col("_b"), col("h")).agg(count(lit(1)).as("_one"))
    val perBucket = Window.partitionBy(col("grp"), col("_b"))
      .orderBy(col("h"))
    val candidates = hashed
      .withColumn("_rn", row_number().over(perBucket))
      .filter(col("_rn") <= k)
    val perGroup = Window.partitionBy(col("grp")).orderBy(col("h"))
    val sketch = candidates
      .withColumn("_rg", row_number().over(perGroup))
      .filter(col("_rg") <= k)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("_m"), max(col("h")).as("_hk"))
      .select(col("grp"),
        round(when(col("_m") >= k, lit(num) / col("_hk").cast("double"))
          .otherwise(col("_m").cast("double")), 6).as("est_distinct"))
    if (!withExact) sketch
    else {
      val exact = df.groupBy(group.as("grp"))
        .agg(countDistinct(value).as("n_exact"))
      exact.join(sketch, Seq("grp"))
    }
  }

  /** Per-group HyperLogLog distinct-count estimate (Flajolet et al. 2007).
    * Output: (grp, n_exact, est_distinct) — the production form drops
    * n_exact, as with [[kmvDistinct]].
    *
    * m = 2^p registers; the 60-bit md5 hash splits into a p-bit register
    * index (low bits) and a (60−p)-bit suffix whose leading-zero count
    * feeds the register: rho = (60−p) + 1 − bitlen(suffix), computed via
    * the EXACT integer identity floor(log2(w)) = length(bin(w)) − 1 — no
    * float log anywhere in register construction. The harmonic sum runs
    * in INTEGERS too: Σ 2^(−M_j) is computed as Σ 2^(scale−M_j) with
    * scale = (60−p)+1, a 64-term exact long sum (≤ 2^61), so
    * partial-aggregation order cannot move the result and a DuckDB oracle
    * replays it bit-for-bit. Small-range linear counting applies below
    * 2.5·m when zero registers exist (the standard correction); the
    * 60-bit hash space makes large-range correction moot.
    *
    * Scale shape: registers build in ONE aggregation with map-side
    * combine — the exchange carries at most |groups|×m partial rows, and
    * register tables merge across shards/windows by MAX, which is how a
    * 1000-executor rollup or a streaming window union composes sketches
    * without touching raw data again. */
  def hllDistinct(df: DataFrame, group: Column, value: Column, p: Int = 6,
                  salt: String = "hll", withExact: Boolean = true)
  : DataFrame = {
    require(p >= 4 && p <= 12, "HLL wants 4 <= p <= 12")
    val est = hllFromRegisters(hllRegisters(df, group, value, p, salt), p)
    if (!withExact) est
    else df.groupBy(group.as("grp"))
      .agg(countDistinct(value).as("n_exact"))
      .join(est, Seq("grp"))
  }

  /** The sparse register table (grp, j, mj) behind [[hllDistinct]] —
    * public because registers are the MERGEABLE form: shard/window
    * register tables union and max-merge into the corpus table
    * (spec-asserted), which is how sketches compose without re-reading
    * raw data. */
  def hllRegisters(df: DataFrame, group: Column, value: Column, p: Int,
                   salt: String = "hll"): DataFrame = {
    val m = 1 << p
    val scale = (60 - p) + 1
    df.select(group.as("grp"),
        Dedup.md5Hash(value.cast("string"), lit(salt)).as("h"))
      .filter(col("h").isNotNull)
      .withColumn("j", col("h").bitwiseAND(lit((m - 1).toLong)))
      .withColumn("w", shiftright(col("h"), p))
      .withColumn("rho", when(col("w") === 0, lit(scale))
        .otherwise(lit(scale) - length(bin(col("w")))))
      .groupBy(col("grp"), col("j")).agg(max(col("rho")).as("mj"))
  }

  /** Estimator over a (grp, j, mj) register table → (grp, est_distinct). */
  def hllFromRegisters(regs: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val scale = (60 - p) + 1
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // single driver-side constant (alpha·m²·2^scale): one double literal,
    // interpolated verbatim into the oracle so both engines fold the same
    // numerator
    val numConst = alpha * m * m * math.pow(2.0, scale)
    // dense m-register grid: absent registers are EXPLICIT zeros — they
    // contribute the 2^scale terms of the harmonic sum and the zero count
    // that triggers linear counting
    val grid = regs.select(col("grp")).distinct()
      .select(col("grp"),
        explode(sequence(lit(0L), lit((m - 1).toLong))).as("j"))
    grid.join(regs, Seq("grp", "j"), "left")
      .withColumn("mj", coalesce(col("mj"), lit(0)))
      .groupBy(col("grp"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - mj)"))
        .as("_sint"),
        sum(when(col("mj") === 0, 1L).otherwise(0L)).as("_v"))
      .withColumn("_raw", lit(numConst) / col("_sint").cast("double"))
      .select(col("grp"), round(
        when(col("_raw") <= lit(2.5 * m) && col("_v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("_v").cast("double")))
          .otherwise(col("_raw")), 4).as("est_distinct"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over a value stream,
    * queried back for every distinct value: (val, n_exact, est, overcount).
    * `depth` independent md5-derived hash rows × `width` counters; a
    * value's estimate is the MIN over its `depth` counters, so
    * est >= exact ALWAYS (collisions only ever inflate) — `over` is the
    * collision overestimate. Deterministic hash family → the oracle
    * rebuilds the identical counter table.
    *
    * Scale shape: the counter table is depth×width rows NO MATTER how many
    * values stream through — one aggregation with map-side combine builds
    * it (occurrences shuffle once on (row, bucket)), and it merges across
    * shards/windows by plain addition. The query joins probes to it on
    * the bucket key; here the probe set is the full vocabulary (for the
    * error audit), in production it is the handful of suspected heavy
    * hitters. */
  def countMin(df: DataFrame, value: Column, depth: Int, width: Int,
               salt: String = "cms"): DataFrame = {
    val v = value.cast("string")
    val occ = df.select(v.as("val"))
    // counters: one row per (hash row j, bucket); explode occurrences
    // depth× BEFORE the aggregation — map-side combine collapses them to
    // depth×width partials per task, so the exchange is sketch-sized
    val rows = explode(array((0 until depth).map(lit): _*)).as("j")
    val counters = occ.select(col("val"), rows)
      .withColumn("b",
        pmod(Dedup.md5Hash(col("val"), concat(lit(salt), col("j"))),
          lit(width.toLong)))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("cnt"))
    val exact = occ.groupBy(col("val")).agg(count(lit(1)).as("n_exact"))
    val probes = exact.select(col("val"), col("n_exact"), rows)
      .withColumn("b",
        pmod(Dedup.md5Hash(col("val"), concat(lit(salt), col("j"))),
          lit(width.toLong)))
    probes.join(counters, Seq("j", "b"))
      .groupBy(col("val"), col("n_exact"))
      .agg(min(col("cnt")).as("est"))
      .withColumn("overcount", col("est") - col("n_exact"))
  }

  /** Per-group quantile sketch: the fourth classic mergeable sketch
    * beside KMV/HLL/CMS, answering "p50/p90 of a 100 TB column" without
    * the exact walk's distinct-value state. Production engines use GK or
    * KLL; their compaction order is merge-order-dependent, so neither is
    * replayable in an external oracle. This is the deterministic
    * equivalent: k independent content-addressed bootstrap draws
    * (sampling WITH replacement — the q91/E3 slot idiom). Slot i's pick
    * is the row minimizing md5Hash(key, salt+i): hash-uniformity makes
    * each slot uniform over the group's rows, independent salts make
    * slots independent, and the exact interpolated quantile of the
    * k-multiset estimates the group quantile with the usual bootstrap
    * ~1/sqrt(k) error — same accuracy class as KLL at equal state.
    *
    * Scale shape: ONE exchange — a group-keyed aggregate of k
    * min(struct(hash, key, v)) partials plus count, state k structs per
    * group REGARDLESS of row count: no window over raw rows, no sort, no
    * global index (contrast [[Quantiles.exactGroupQuantiles]], whose
    * state is distinct-values-per-group — right for quantized columns,
    * wrong for raw continuous ones; this sketch has no such caveat). The
    * k-row-per-group sample then feeds the exact walk, whose state is
    * trivially bounded by k. Ties on the 60-bit hash break by key string,
    * so the sample is deterministic and partitioning-independent.
    *
    * Returns (grp, frac, n_rows, est_q) UNROUNDED — one row per group
    * per fraction; callers apply the registry float policy. Null values
    * must be filtered by the caller (so the oracle's WHERE clause can
    * match). */
  /** The ONE definition of the slot-sketch state both quantile forms
    * consume — (grp, n_rows, _w0.._w{k-1}) where _wi =
    * min(struct(md5Hash(key, salt+i), key, v)). [[slotSampleQuantiles]]
    * and [[slotQuantileSnapshot]] share it so the "same salt → identical
    * picks" guarantee (d103's est side ≡ s20's snapshot) holds by
    * construction, not by two copies staying in sync. */
  private def slotWinnersAgg(df: DataFrame, grp: Column, key: Column,
                             v: Column, k: Int, salt: String): DataFrame = {
    require(k >= 2, "slot quantile sketch: k must be >= 2")
    val base = df.select(grp.as("grp"), key.cast("string").as("_k"),
      v.cast("double").as("_v"))
    val winners = (0 until k).map(i => min(struct(
      Dedup.md5Hash(col("_k"), lit(s"$salt$i")).as("h"),
      col("_k").as("k"), col("_v").as("v"))).as(s"_w$i"))
    base.groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("n_rows"), winners: _*)
  }

  def slotSampleQuantiles(df: DataFrame, grp: Column, key: Column,
                          v: Column, fracs: Seq[Double], k: Int,
                          salt: String = "qs"): DataFrame = {
    require(fracs.nonEmpty, "slotSampleQuantiles: fracs must be non-empty")
    require(fracs.forall(f => f >= 0.0 && f <= 1.0),
      s"slotSampleQuantiles: fracs must be in [0,1], got " +
        fracs.mkString(","))
    val agg = slotWinnersAgg(df, grp, key, v, k, salt)
    val vals = array((0 until k).map(i => col(s"_w$i").getField("v")): _*)
    val sample = agg.select(col("grp"), explode(vals).as("_sv"))
    Quantiles.exactGroupQuantiles(sample, col("grp"), col("_sv"), fracs)
      .join(broadcast(agg.select(col("grp"), col("n_rows"))), Seq("grp"))
      .select(col("grp"), col("frac"), col("n_rows"), col("q").as("est_q"))
  }

  /** Projection-form snapshot of the slot-sample sketch: the SAME k
    * bootstrap draws as [[slotSampleQuantiles]] (same salt → identical
    * picks), but quantile extraction is a PURE projection of the k
    * winner columns — sorted k-array + constant-index lerp, no window,
    * no join, no second aggregate. The whole operator is therefore one
    * keyed aggregate plus a map, which makes it a legal complete-mode
    * STREAMING aggregation: the sketch state (count + k min-structs per
    * group) IS the streaming state, min merges associatively across
    * micro-batches, and every emitted snapshot is the correct sketch of
    * all rows seen so far — the mergeability that makes the sketch
    * 100 TB-safe, demonstrated live.
    *
    * Float parity: the lerp index f·(k−1), its floor, and the fractional
    * weight are compile-time Scala doubles — IEEE-identical to an engine
    * computing f·(k−1) at runtime — and the lerp tree mirrors
    * `Queries.interpSql` (vlo + w·(vhi − vlo)), so a DuckDB oracle
    * affording the sorted 64-list reproduces each value bit-for-bit.
    * Output: (grp, n_rows, <name> per frac), each quantile rounded 6
    * cross-engine. */
  def slotQuantileSnapshot(df: DataFrame, grp: Column, key: Column,
                           v: Column, fracs: Seq[(String, Double)], k: Int,
                           salt: String = "qs"): DataFrame = {
    require(fracs.nonEmpty, "slotQuantileSnapshot: fracs must be non-empty")
    require(fracs.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
      s"slotQuantileSnapshot: fracs must be in [0,1], got " +
        fracs.map(_._2).mkString(","))
    val agg = slotWinnersAgg(df, grp, key, v, k, salt)
    val arr = array_sort(
      array((0 until k).map(i => col(s"_w$i").getField("v")): _*))
    val qCols = fracs.map { case (name, f) =>
      val idx = f * (k - 1)
      val lo = math.floor(idx).toInt
      val w = idx - lo
      round(element_at(arr, lo + 1) + lit(w)
        * (element_at(arr, math.ceil(idx).toInt + 1) - element_at(arr, lo + 1)),
        6).as(name)
    }
    agg.select(col("grp") +: col("n_rows") +: qCols: _*)
  }
}
