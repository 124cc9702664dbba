package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the SCALE.md claim: because every per-user stage groups/windows
  * on the single `user_id` key, reading from a user-bucketed table deletes
  * the pipeline's one big exchange WITHOUT code changes — the bucketed scan
  * reports hashpartitioning(u) and trim → pivot → horizontal-stats all
  * reuse it. The same pipeline from an unbucketed source plans the
  * exchange, which is the 100 TB shuffle this optimization removes. */
class BucketingSpec extends SparkSpec {

  private val vocab = Seq("0", "1", "2", "3", "4")

  private def pipeline(src: org.apache.spark.sql.DataFrame) = {
    val trimmed = Trim.headTail(src, 2, Seq("u"), Seq(col("ord")))
    val pv = Pivots.pivotCount(trimmed, "u", "code", vocab, "amt", "freq")
    HorizontalStats.withStats(pv, vocab.map(v => s"freq_$v"), "hs")
  }

  test("user-bucketed table: trim → pivot → stats runs with ZERO exchanges") {
    val df = spark.range(400).select(
      (col("id") % 20).as("u"), col("id").as("ord"),
      (col("id") % 5).cast("string").as("code"),
      ((col("id") % 7).cast("double") + 1.0).as("amt"))
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_events")
    df.write.bucketBy(4, "u").sortBy("u", "ord")
      .mode("overwrite").saveAsTable("graft_bucketed_events")

    val bucketed = pipeline(spark.table("graft_bucketed_events"))
    val rows = bucketed.collect()
    assert(rows.length == 20)
    val bucketedPlan = bucketed.queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("Exchange"),
      s"bucketed read still exchanges:\n$bucketedPlan")

    // control: the identical pipeline from an unbucketed source shuffles
    val plain = pipeline(df)
    assert(plain.collect().map(_.getLong(0)).sorted.toSeq ==
      rows.map(_.getLong(0)).sorted.toSeq)
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))

    spark.sql("DROP TABLE IF EXISTS graft_bucketed_events")
  }
}
