package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated warm-timing harness for optimization rounds: per named
  * query, one warmup pass then two timed noop-sink runs with
  * clearCache+GC between them — the quick per-row counterpart of the
  * full Bench (which carries the driver contract; this is local
  * tooling only, like PlanDump/JobProfile). SCRATCH_SMJ /
  * SCRATCH_SHJ_THRESH expose the join-strategy A/B the r18 round used
  * to evaluate preferSortMergeJoin=false (declined: no win at sf0.1,
  * see OPTIMIZATION_r18.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SCRATCH_SMJ", "true"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SCRATCH_SHJ_THRESH", "0"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.1")
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val names = args.toSeq
    for (n <- names) {
      try {
        noop(SparkEntry.queries(n)(spark, d)) // warm
        spark.catalog.clearCache(); System.gc()
        t(n) { noop(SparkEntry.queries(n)(spark, d)) }
        spark.catalog.clearCache(); System.gc()
        t(n + "-2") { noop(SparkEntry.queries(n)(spark, d)) }
      } catch { case e: Throwable =>
        System.err.println(s"[scratch] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
