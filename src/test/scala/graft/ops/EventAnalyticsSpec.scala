package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Crafted-input checks for the event-analytics operators (funnel, cohort
  * retention, decayed value): the driver's DuckDB oracle checks them at
  * data scale (q54–q56); these pin the decision semantics on inputs built
  * to hit the ordering edge cases. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel requires strictly increasing first-touch times") {
    val df = Seq(
      // user 1: full ordered path
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-02 10:00:00")),
      (1L, "click", ts("2024-01-03 10:00:00")),
      // user 2: clicked BEFORE first view → stops at view
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-02 09:00:00")),
      (2L, "view", ts("2024-01-02 10:00:00")),
      // user 3: no signup → reaches nothing (view alone doesn't count)
      (3L, "view", ts("2024-01-01 10:00:00")),
      // user 4: signup only
      (4L, "signup", ts("2024-01-05 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(df, col("user_id"), col("event_type"),
      col("ts"), Seq("signup", "view", "click")).orderBy("stage_idx")
      .collect()
    assert(out.map(_.getAs[String]("stage")).toSeq ==
      Seq("signup", "view", "click"))
    assert(out.map(_.getAs[Long]("users")).toSeq == Seq(3L, 2L, 1L))
    // stage-1 conversion is null; later stages divide by the previous stage
    assert(out(0).isNullAt(out(0).fieldIndex("conv_from_prev")))
    assert(out(1).getAs[Double]("conv_from_prev") == 0.666667) // round 6

    assert(out(2).getAs[Double]("conv_from_prev") == 0.5)
  }

  test("funnel user counts are monotone non-increasing by construction") {
    val e = graft.schema.Tables.events(spark, "/root/testdata/sf0.001")
    val users = EventAnalytics.funnel(e, col("user_id"), col("event_type"),
      col("ts"), Seq("signup", "view", "click", "purchase"))
      .orderBy("stage_idx").collect().map(_.getAs[Long]("users"))
    assert(users.sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("cohortRetention anchors offsets to the first active week") {
    val df = Seq(
      // user 1 first active week of Jan 1 (Mon), returns wk of Jan 15
      (1L, ts("2024-01-03 12:00:00")),
      (1L, ts("2024-01-16 08:00:00")),
      (1L, ts("2024-01-17 09:00:00")), // same week — counted once
      // user 2: single week, cohort of Jan 8
      (2L, ts("2024-01-08 00:00:00"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(df, col("user_id"), col("ts"))
      .orderBy("cohort_week_s", "week_offset").collect()
    val jan1 = ts("2024-01-01 00:00:00").getTime / 1000
    val jan8 = jan1 + 7 * 86400
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((jan1, 0L, 1L), (jan1, 2L, 1L), (jan8, 0L, 1L)))
  }

  test("decayedValue halves per week and is exact on the week grid") {
    val ref = 1707091200000000L // 2024-02-05 00:00:00 UTC
    val df = Seq(
      (1L, ts("2024-02-04 00:00:00"), 8.0), // age 0 → weight 1
      (1L, ts("2024-01-28 00:00:00"), 8.0), // age 1 → weight 1/2
      (1L, ts("2024-01-14 00:00:00"), 8.0), // age 3 → weight 1/8
      (2L, ts("2024-02-04 23:59:59"), 1.0) // age 0
    ).toDF("user_id", "ts", "value")
    val out = EventAnalytics.decayedValue(df, col("user_id"), col("ts"),
      col("value"), ref).orderBy("user_id").collect()
    assert(out(0).getAs[Double]("decayed_value") == 8.0 + 4.0 + 1.0)
    assert(out(0).getAs[Long]("n_events") == 3)
    assert(out(0).getAs[Long]("latest_age_weeks") == 0)
    assert(out(1).getAs[Double]("decayed_value") == 1.0)
  }

  test("decayedValue caps age (no shift overflow) and floors future events") {
    val ref = 1707091200000000L
    val df = Seq(
      (1L, ts("1970-01-10 00:00:00"), 1024.0), // ancient → capped at maxWeeks
      (2L, ts("2024-02-06 00:00:00"), 4.0) // AFTER ref → clamped to age 0
    ).toDF("user_id", "ts", "value")
    val out = EventAnalytics.decayedValue(df, col("user_id"), col("ts"),
      col("value"), ref, maxWeeks = 10).orderBy("user_id").collect()
    assert(out(0).getAs[Double]("decayed_value") == 1.0) // 1024 / 2^10
    assert(out(0).getAs[Long]("latest_age_weeks") == 10)
    assert(out(1).getAs[Double]("decayed_value") == 4.0)
    assert(out(1).getAs[Long]("latest_age_weeks") == 0)
  }
}
