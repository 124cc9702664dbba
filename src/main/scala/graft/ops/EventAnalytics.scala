package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form

/**
 * Product/event analytics over an event stream: first-touch funnels,
 * weekly cohort retention, and recency-decayed value features.
 *
 * Scale design: each operator makes exactly ONE corpus-sized shuffle — the
 * per-user aggregation, map-side combined down to a handful of values per
 * user (4 stage timestamps / the distinct week set / one decayed sum) —
 * and all cross-user math happens on user-count-sized or constant-sized
 * intermediates. Nothing here ever windows or sorts the raw event log
 * globally, so the plans are the same at 100 TB as at 60k rows.
 */
object EventAnalytics {

  /** First-touch ordered funnel: a user reaches stage k when the FIRST
    * occurrence of every stage up to k is strictly later than the previous
    * stage's first occurrence (the classic product-analytics funnel over
    * immutable event logs). Returns one row per stage:
    * (stage_idx, stage, users, conv_from_prev).
    *
    * One shuffle: groupBy(user) with 4 conditional-min aggregates
    * (map-side combined); stage counts are a single 1-row aggregate
    * exploded into the stage rows. Counts are integer-exact; the
    * conversion ratio divides two longs (round 6, null for stage 1 or a
    * zero denominator). */
  def funnel(events: DataFrame, user: Column, eventType: Column, ts: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val firsts = stages.map(t => min(when(eventType === t, ts)).as(s"_t_$t"))
    val perUser = events.groupBy(user).agg(firsts.head, firsts.tail: _*)
    val reached = stages.indices.map { k =>
      val cond = (1 to k).foldLeft(col(s"_t_${stages.head}").isNotNull) {
        (acc, i) => acc && col(s"_t_${stages(i)}") > col(s"_t_${stages(i - 1)}")
      }
      sum(cond.cast("long")).as(s"_u$k")
    }
    val agg = perUser.agg(reached.head, reached.tail: _*)
    val rows = stages.indices.map { k =>
      val conv =
        if (k == 0) lit(null).cast("double")
        else when(col(s"_u${k - 1}") > 0,
          round(col(s"_u$k").cast("double")
            / col(s"_u${k - 1}").cast("double"), 6))
      struct(lit((k + 1).toLong).as("stage_idx"), lit(stages(k)).as("stage"),
        col(s"_u$k").as("users"), conv.as("conv_from_prev"))
    }
    agg.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }

  /** Weekly cohort retention: cohort = Monday (epoch seconds) of the
    * user's first active week; one row per (cohort_week_s, week_offset)
    * counting users active that week.
    *
    * ONE corpus-sized shuffle: the per-user groupBy collects the user's
    * DISTINCT week set (map-side combined, bounded by weeks-in-history —
    * a few hundred values even for a decade); cohort = array_min of the
    * set, and the exploded rows feeding the final (cohort, offset) agg
    * are users × weeks, not events. Monday-midnight epochs make the
    * offset exact integer arithmetic. */
  def cohortRetention(events: DataFrame, user: Column, ts: Column)
  : DataFrame = {
    val wk = unix_seconds(date_trunc("week", ts))
    events.select(user.as("_user"), wk.as("_wk"))
      .groupBy(col("_user")).agg(collect_set(col("_wk")).as("_wks"))
      .select(array_min(col("_wks")).as("cohort_week_s"),
        explode(col("_wks")).as("_wk"))
      .groupBy(col("cohort_week_s"),
        ((col("_wk") - col("cohort_week_s")) / 604800L).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Recency-decayed per-user value: each event contributes
    * value × 2^(−age_weeks), age_weeks = whole weeks from the event to
    * `refEpochUs` (integer µs floor-division — no float boundary), capped
    * at `maxWeeks` so the shift can't overflow. The weight is an exact
    * power of two via shiftleft — never pow(), whose libm rounding is
    * engine-specific — so each term is one exact double scaling and the
    * rounded sum is reproducible in any IEEE engine. Returns
    * (user, decayed_value, n_events, latest_age_weeks); one user shuffle
    * with map-side combine. */
  def decayedValue(events: DataFrame, user: Column, ts: Column,
                   value: Column, refEpochUs: Long, maxWeeks: Int = 40)
  : DataFrame = {
    val wkUs = 604800000000L
    // integer floor-division via pmod: (diff - diff mod w) / w is an exact
    // integral double (< 2^53), so the long cast is lossless — identical
    // to the oracle's `//` on BIGINT
    val diff = greatest(lit(refEpochUs) - unix_micros(ts), lit(0L))
    val age = least(((diff - pmod(diff, lit(wkUs))) / wkUs).cast("long"),
      lit(maxWeeks.toLong))
    events
      .withColumn("_age", age)
      .withColumn("_term", value
        / call_function("shiftleft", lit(1L), col("_age").cast("int"))
          .cast("double"))
      .groupBy(user)
      .agg(round(sum(col("_term")), 6).as("decayed_value"),
        count(lit(1)).as("n_events"),
        min(col("_age")).as("latest_age_weeks"))
  }
}
