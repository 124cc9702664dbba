package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * Preference-data aggregation: pairwise comparisons → per-item strength
 * via Bradley–Terry (Bradley & Terry 1952, minorize–maximize updates per
 * Hunter 2004) — the leaderboard computation RLHF pipelines run over
 * human preference data (per-model arena ratings are exactly this shape).
 *
 * Two halves, separately reusable:
 *  - [[pairComparisons]] builds a deterministic comparison set from a
 *    scored corpus: content-addressed bucket + one per-bucket window
 *    pairs each row with its hash-order neighbour, so every row is
 *    compared at most once (linear, never a pairwise join), and the
 *    winner is decided by the score with a key tie-break. Re-runs,
 *    engines and partitionings produce the identical pair set.
 *  - [[bradleyTerry]] runs the MM fixed point on the aggregated
 *    (item i, item j, games, wins) table — group-count-sized, so every
 *    iteration is broadcast-scale even when the corpus is 100 TB.
 *
 * Determinism (the oracle story): per-pair contributions pass through
 * DOUBLE divide (IEEE, order-free) → DECIMAL(20,10) cast → EXACT decimal
 * sum — GraphRank's decimal sandwich — then ONE double division per item
 * and a 6-dp cross-engine round per iteration, so a SQL oracle replays
 * the fixed iteration count as a finite CTE chain. The update is
 * anchored by ONE virtual win and ONE virtual loss against a dummy
 * opponent pinned at strength 1.0 (the standard regularization): no
 * zero-win item can collapse to 0, no all-win item can diverge, and the
 * anchor pins the scale so no per-iteration normalization is needed.
 */
object Preference {

  /** Deterministic cross-group comparison pairs from a scored table.
    * Rows land in `buckets` content-addressed buckets, are ordered by a
    * second content hash within each bucket, and odd positions pair with
    * their successor — each row used at most once, cost one bucket-hash
    * exchange + one window (buckets scale with the cluster, so no
    * single-partition window at 100 TB). Same-group pairs and trailing
    * unpaired rows drop. Winner: higher score, ties to the smaller key.
    * Returns one row per UNORDERED group pair: (i, j, n, wins_i) with
    * i < j lexicographically. */
  def pairComparisons(df: DataFrame, key: Column, group: Column,
                      score: Column, buckets: Int, salt: String = "bt")
  : DataFrame =
    pairOutcomes(df, key, group, score, buckets, salt)
      .select(least(col("group_a"), col("group_b")).as("i"),
        greatest(col("group_a"), col("group_b")).as("j"),
        col("win_group").as("_win"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_win") === col("i"), 1L).otherwise(0L)).as("wins_i"))

  /** The per-comparison layer under [[pairComparisons]]: one row per
    * decided comparison — (key_a, group_a, score_a, key_b, group_b,
    * score_b, win_key, win_group), a/b in hash order. Exposed so audits
    * (length bias, calibration) can see individual outcomes; the
    * aggregated pair table is its groupBy. */
  def pairOutcomes(df: DataFrame, key: Column, group: Column,
                   score: Column, buckets: Int, salt: String = "bt")
  : DataFrame = {
    require(buckets >= 1, "pairOutcomes: buckets must be positive")
    val win = Window.partitionBy(col("_b")).orderBy(col("_h"), col("_k"))
    df.select(key.as("_k"), group.as("_g"), score.as("_q"))
      .withColumn("_b",
        Dedup.md5Hash(col("_k").cast("string"), lit(salt)) % buckets)
      .withColumn("_h",
        Dedup.md5Hash(col("_k").cast("string"), lit(s"$salt.o")))
      .withColumn("_pos", row_number().over(win))
      .withColumn("_k2", lead(col("_k"), 1).over(win))
      .withColumn("_g2", lead(col("_g"), 1).over(win))
      .withColumn("_q2", lead(col("_q"), 1).over(win))
      .filter(col("_pos") % 2 === 1 && col("_k2").isNotNull
        && col("_g") =!= col("_g2"))
      .withColumn("win_key",
        when(col("_q") > col("_q2"), col("_k"))
          .when(col("_q2") > col("_q"), col("_k2"))
          .when(col("_k") < col("_k2"), col("_k")).otherwise(col("_k2")))
      .select(col("_k").as("key_a"), col("_g").as("group_a"),
        col("_q").as("score_a"), col("_k2").as("key_b"),
        col("_g2").as("group_b"), col("_q2").as("score_b"),
        col("win_key"),
        when(col("win_key") === col("_k"), col("_g")).otherwise(col("_g2"))
          .as("win_group"))
  }

  /** Length-bias audit of a [[pairOutcomes]] comparison set — the
    * standard verbosity check on preference data (does "longer" win more
    * than it should?). Joins a (key, len) table onto both sides of every
    * comparison, then aggregates per group: games, wins, games where
    * this side was the longer one, wins while longer / while shorter,
    * and the longer-win share (6-dp; NULL when the group never fielded
    * the longer side). A longer_win_share far above n_wins/n_games says
    * the preference signal is confounded with length. Integer-exact
    * counts; two key equi-joins + one group aggregation — linear. */
  def lengthBiasAudit(outcomes: DataFrame, lengths: DataFrame)
  : DataFrame = {
    val la = lengths.toDF("key_a", "_la")
    val lb = lengths.toDF("key_b", "_lb")
    val oc = outcomes.join(la, Seq("key_a")).join(lb, Seq("key_b"))
    val pa = oc.select(col("group_a").as("grp"),
        (col("win_key") === col("key_a")).as("_won"),
        (col("_la") > col("_lb")).as("_longer"),
        (col("_la") < col("_lb")).as("_shorter"))
      .union(oc.select(col("group_b").as("grp"),
        (col("win_key") === col("key_b")).as("_won"),
        (col("_lb") > col("_la")).as("_longer"),
        (col("_lb") < col("_la")).as("_shorter")))
    pa.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_games"),
        sum(when(col("_won"), 1L).otherwise(0L)).as("n_wins"),
        sum(when(col("_longer"), 1L).otherwise(0L)).as("n_longer"),
        sum(when(col("_longer") && col("_won"), 1L).otherwise(0L))
          .as("wins_longer"),
        sum(when(col("_shorter") && col("_won"), 1L).otherwise(0L))
          .as("wins_shorter"))
      .withColumn("longer_win_share",
        when(col("n_longer") > 0,
          round(col("wins_longer").cast("double") / col("n_longer"), 6)))
  }

  /** Group-relative advantage (the GRPO normalization, Shao et al. 2024:
    * DeepSeekMath): within each group of k candidate completions for the
    * same prompt, advantage_i = (r_i − mean_group) / std_group
    * (population σ) — the critic-free baseline RL-finetuning pipelines
    * compute over every sampled generation batch. Emits one row per
    * member: (key, grp, reward, n_group, r_mean, r_std, advantage);
    * std = 0 groups (all rewards equal, or singletons) get advantage 0,
    * the convention that zeroes their gradient contribution.
    *
    * Determinism: `reward` must be integer-valued (cast to long), so the
    * window sums Σr and Σr² are EXACT regardless of partitioning or
    * order; mean/var/std/advantage are then fixed IEEE expressions over
    * those exact integers — identical on any engine that replays the
    * same expression shape. Advantage is negative-zero-normalized
    * (r ≈ mean cancels to a signed tiny). Σr² bounds the reward scale:
    * |r| ≤ 1e6 keeps a 9-million-member group inside BIGINT
    * (n·(1e6)² ≤ 9.2e18 ⇒ n ≤ ~9.2e6 — ample for k-sized prompt sample
    * sets, which are tens to thousands); wider rewards or genuinely
    * huge groups move the window sums to DECIMAL(38,0).
    *
    * Scale shape: ONE exchange on the group key, three window aggregates
    * over it, then pure projection — groups are k-sized (a prompt's
    * sample set), so no skew, no join, no corpus-global state; group
    * count grows with the corpus and never bottlenecks. */
  def groupAdvantage(df: DataFrame, key: Column, group: Column,
                     reward: Column): DataFrame = {
    val w = Window.partitionBy(col("grp"))
    val nD = col("n_group").cast("double")
    val mean = col("_s1").cast("double") / nD
    df.select(key.as("key"), group.as("grp"),
        reward.cast("long").as("reward"))
      .withColumn("n_group", count(lit(1)).over(w))
      .withColumn("_s1", sum(col("reward")).over(w))
      .withColumn("_s2", sum(col("reward") * col("reward")).over(w))
      .withColumn("_mean", mean)
      .withColumn("_std", sqrt(greatest(
        col("_s2").cast("double") / nD - col("_mean") * col("_mean"),
        lit(0.0))))
      .select(col("key"), col("grp"), col("reward"), col("n_group"),
        round(col("_mean"), 6).as("r_mean"),
        round(col("_std"), 6).as("r_std"),
        CrossRound.roundNz(when(col("_std") > 0.0,
          (col("reward").cast("double") - col("_mean")) / col("_std"))
          .otherwise(lit(0.0)), 6).as("advantage"))
  }

  /** Fixed-iteration Bradley–Terry MM over an aggregated pair table
    * (i, j, n, wins_i). Each iteration: s_x ← (wins_x + 1) /
    * (Σ_pairs n/(s_x + s_opp) + 2/(s_x + 1)), the +1/+2 terms being the
    * virtual anchor games against the dummy at 1.0. Returns one row per
    * participating item: (item, n_games, n_wins, strength). The pair
    * table is items²-bounded — iterations never touch the corpus. */
  def bradleyTerry(pairs: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "bradleyTerry: iters must be >= 1")
    // ONE partition for the loop state: the pair table is items²-bounded
    // (items are models/sources — thousands at most), so every iteration
    // join and aggregation stays a single-task stage instead of paying
    // 3 × several 32-partition shuffles of 20-row tables; the corpus
    // never enters the loop.
    val p = pairs.select(col("i"), col("j"), col("n"), col("wins_i"))
      .coalesce(1).localCheckpoint(true)
    val stats = p.select(col("i").as("item"), col("n"),
        col("wins_i").as("_w"))
      .union(p.select(col("j").as("item"), col("n"),
        (col("n") - col("wins_i")).as("_w")))
      .groupBy(col("item"))
      .agg(sum(col("n")).as("n_games"), sum(col("_w")).as("n_wins"))
      .coalesce(1).localCheckpoint(true)
    var str = stats.select(col("item"), lit(1.0).as("s"))
    for (it <- 0 until iters) {
      val withS = p
        .join(str.select(col("item").as("i"), col("s").as("_si")),
          Seq("i"))
        .join(str.select(col("item").as("j"), col("s").as("_sj")),
          Seq("j"))
      val term = (col("n").cast("double") / (col("_si") + col("_sj")))
        .cast("decimal(20,10)")
      // decimal round to 6 dp BEFORE the double cast (functions.round on
      // the decimal — exact integer arithmetic, identical half-up both
      // engines; a wide decimal cast straight to double is NOT
      // cross-engine-stable, see GraphRank's scaladoc)
      val denom = withS.select(col("i").as("item"), term.as("_t"))
        .union(withS.select(col("j").as("item"), term.as("_t")))
        .groupBy(col("item"))
        .agg(org.apache.spark.sql.functions.round(sum(col("_t")), 6)
          .cast("double").as("_d"))
      str = stats.join(denom, Seq("item")).join(str, Seq("item"))
        .select(col("item"),
          round((col("n_wins") + 1).cast("double")
            / (col("_d") + lit(2.0) / (col("s") + lit(1.0))), 6).as("s"))
      // truncate the loop state's LOGICAL plan each round except the
      // last (the d10 labelComponents discipline, MM edition): `str`
      // feeds four joins per iteration, so the lazy tree grows ~4x per
      // round and the r18 job profile measured d78/d80 spending 1.5-2.9s
      // of pure driver time analyzing the compounded plan. Each round's
      // strengths are exact materialized rows (already rounded to 6 dp),
      // so the checkpointed values are bit-identical to the lazy form;
      // the final round stays lazy for the caller's one action.
      if (it < iters - 1) str = str.coalesce(1).localCheckpoint(true)
    }
    stats.join(str, Seq("item"))
      .select(col("item"), col("n_games"), col("n_wins"),
        col("s").as("strength"))
  }
}
