package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resistant aggregation: two-phase salted combine for hot grouping
 * keys. A single user (or shingle, or band key) holding 1% of a 100 TB
 * table turns one reducer into the job's critical path; salting splits the
 * hot key across `salts` reducers and merges the partials in a second,
 * tiny aggregation.
 *
 * Only ALGEBRAIC aggregates decompose this way (sum/count/min/max, and
 * avg = sum/count carried separately). Holistic aggregates (exact median,
 * collect_list order) must go through AQE skew handling or per-key
 * repartitioning instead. AQE's skewedJoin covers JOIN skew at runtime;
 * this helper covers AGGREGATION skew, which AQE does not rebalance.
 */
object Skew {

  /** Deterministic salt from row content (NOT rand() — keeps retries,
    * resumed stages, and oracle runs reproducible). */
  def salt(on: Column, salts: Int): Column = pmod(hash(on), lit(salts))

  /** Salted sum/count/min/max per key: phase 1 groups on (key, salt) with
    * full map-side combine; phase 2 merges the per-salt partials. Result
    * columns: `<valueCol>_sum`, `_count`, `_min`, `_max`, `_avg`. */
  def saltedStats(df: DataFrame, key: String, valueCol: String,
                  saltOn: Column, salts: Int = 16): DataFrame = {
    val v = col(valueCol).cast("double")
    val phase1 = df
      .withColumn("_salt", salt(saltOn, salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(v).as("_s"), count(v).as("_c"),
        min(v).as("_mn"), max(v).as("_mx"))
    phase1.groupBy(col(key)).agg(
      sum(col("_s")).as(s"${valueCol}_sum"),
      sum(col("_c")).as(s"${valueCol}_count"),
      min(col("_mn")).as(s"${valueCol}_min"),
      max(col("_mx")).as(s"${valueCol}_max"),
      (sum(col("_s")) / sum(col("_c"))).as(s"${valueCol}_avg"))
  }

  /** Salted equi-join for JOIN skew when the small side is too big to
    * broadcast (or broadcast is disabled): the big side salts each row
    * deterministically, the small side replicates `salts`× , and the join
    * key becomes (key, salt) — a hot key's rows now land on `salts`
    * reducers instead of one. Row-identical to `big.join(small, key)`.
    * Replication cost is `salts × |small|`, which is the explicit price of
    * dodging the hot reducer; AQE's runtime skew split covers the same
    * case adaptively, this is the deterministic plan-level form. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltOn: Column, salts: Int = 16): DataFrame = {
    val b = big.withColumn("_salt", salt(saltOn, salts))
    val sm = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    // shuffle_hash: the whole point is spreading (key, salt) across
    // reducers — a broadcast of the replicated side would both defeat the
    // demonstration and pay the replication for nothing
    b.join(sm.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}
