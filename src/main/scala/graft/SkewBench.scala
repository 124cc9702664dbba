package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Skew kill test (SCALE.md "Aggregation skew", measured): a deliberately
  * pathological key — ONE user holding a fixed share of all rows — driven
  * through the aggregation and join paths, naive vs mitigated, wall-clock
  * printed as one JSON line. `runMain graft.SkewBench [rows] [hotDen]`
  * (defaults 20M, 4 → hot user owns 1 row in 4).
  *
  * WHY 25% locally models 1% at cluster scale: what stalls a stage is the
  * straggler RATIO — hot-key rows vs average-partition rows, i.e.
  * hotShare × numPartitions. The brief's scenario (1% of events on one
  * user, 1000 reducers) gives 0.01 × 1000 = 10x; at local[32] with 32
  * shuffle partitions, 1% is 0.32x — invisible by construction. hotDen=4
  * (25%) reproduces the cluster's 8-10x straggler ratio on 32 partitions;
  * the MECHANISM measured (one reducer owning the key) is identical.
  *
  * What this measures (and what round-9 numbers showed):
  *  - ALGEBRAIC aggregation (sum/count/min/max/avg) is skew-immune in
  *    Spark already: map-side partial combine collapses the hot key to
  *    one partial row per map task before the shuffle, so `saltedStats`
  *    buys nothing here — the honest scope for salting is holistic /
  *    buffer-bound aggregates and joins, and SCALE.md says so with these
  *    numbers rather than folklore.
  *  - JOIN skew is real: with broadcast off (a 100 TB small side is past
  *    the ceiling) and AQE skew-split off, the hot key's reducer is the
  *    critical path; `Skew.saltedJoin` spreads it across `salts`
  *    reducers. AQE's runtime skew split (third timing) is the adaptive
  *    fix the repo recommends FIRST — the salted form is the
  *    deterministic plan-level fallback for when AQE can't see the skew
  *    (e.g. skew born inside a stage, not at a shuffle boundary).
  */
object SkewBench {

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val hotDen = args.lift(1).map(_.toLong).getOrElse(4L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1 row in hotDen on user 0; the rest spread over ~rows/20 users.
    // localCheckpoint so fixture generation is not re-timed per query.
    val events = spark.range(rows).select(
      when(pmod(col("id"), lit(hotDen)) === 0, 0L)
        .otherwise(pmod(col("id"), lit(rows / 100)) + 1L).as("user_id"),
      (col("id") % 9973).cast("double").as("value"),
      col("id").as("event_id")).localCheckpoint(true)
    // dim deliberately sized at rows/100: big enough that a 100 TB analog
    // is past the broadcast ceiling, small enough that saltedJoin's
    // salts x |dim| replication stays a fraction of the probe side
    val dim = spark.range(rows / 100 + 1)
      .select(col("id").as("user_id"),
        (col("id") % 97).cast("string").as("segment")).localCheckpoint(true)

    def measure(tag: String)(body: => Unit): (String, Double) = {
      body // warm (codegen + JIT)
      val t = (1 to 3).map(_ => time(body)).min
      tag -> (math.round(t * 100) / 100.0)
    }

    val aggNaive = measure("agg_naive") {
      sink(events.groupBy("user_id").agg(sum($"value"), count($"value"),
        min($"value"), max($"value"), avg($"value")))
    }
    val aggSalted = measure("agg_salted") {
      sink(Skew.saltedStats(events, "user_id", "value",
        saltOn = $"event_id", salts = 32))
    }

    def noBroadcast[A](aqeSkew: Boolean)(body: => A): A = {
      val conf = spark.conf
      val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.forceOptimizeSkewedJoin")
        .map(k => k -> conf.getOption(k))
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", aqeSkew.toString)
      try body finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }

    val joinNaive = measure("join_naive_no_aqe") {
      noBroadcast(aqeSkew = false) {
        sink(events.join(dim.hint("shuffle_hash"), Seq("user_id"))
          .groupBy("segment").agg(count(lit(1)).as("n")))
      }
    }
    val joinSalted = measure("join_salted") {
      noBroadcast(aqeSkew = false) {
        sink(Skew.saltedJoin(events, dim, "user_id",
            saltOn = $"event_id", salts = 8)
          .groupBy("segment").agg(count(lit(1)).as("n")))
      }
    }
    val joinAqe = measure("join_naive_aqe_skew") {
      noBroadcast(aqeSkew = true) {
        sink(events.join(dim.hint("shuffle_hash"), Seq("user_id"))
          .groupBy("segment").agg(count(lit(1)).as("n")))
      }
    }

    val results = Seq(aggNaive, aggSalted, joinNaive, joinSalted, joinAqe)
    println(results.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"rows":$rows,"hot_share":${1.0 / hotDen},""", ",", "}"))
    spark.stop()
  }
}
