package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * P4/P5/P6: calendar-time attribute derivations (reference `run.py:90-97`,
 * `model.py:216-220`).
 *
 * All pure `Column` functions — they stay inside whole-stage codegen and cost
 * nothing beyond the projection.
 */
object TimeFeatures {

  /** pandas `dt.dayofweek` is Monday=0..Sunday=6; Spark `dayofweek` is
    * Sunday=1..Saturday=7. Shift once, here, and nowhere else
    * (SURVEY.md §7.4). */
  def dayOfWeekMon0(ts: Column): Column = (dayofweek(ts) + lit(5)) % lit(7)

  /** P5: seconds since midnight (`run.py:97`). Spark `second()` truncates the
    * fractional part, same as pandas `.second`. */
  def secondsSinceMidnight(ts: Column): Column =
    hour(ts) * lit(3600) + minute(ts) * lit(60) + second(ts)

  /** P6: whole hours between a row's timestamp and a fixed reference instant
    * (`run.py:96` — pandas `.astype('timedelta64[h]')`). Integer microsecond
    * arithmetic so sub-second fractions can never flip an hour boundary.
    * pandas truncates toward zero; for refMicros <= ts (we rebase on the
    * global minimum) floor == trunc. */
  def hoursSince(ts: Column, refMicros: Column): Column =
    floor((unix_micros(ts) - refMicros) / lit(3600000000L)).cast("long")

  /** P4+P5 bundle: hour_of_day, day_of_week (Mon=0), day_of_month, month,
    * time_day (`run.py:90-97`). */
  def withTimeAttrs(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    val ts = col(tsCol)
    df.withColumn("hour_of_day", hour(ts))
      .withColumn("day_of_week", dayOfWeekMon0(ts))
      .withColumn("day_of_month", dayofmonth(ts))
      .withColumn("month", month(ts))
      .withColumn("time_day", secondsSinceMidnight(ts))
  }
}
