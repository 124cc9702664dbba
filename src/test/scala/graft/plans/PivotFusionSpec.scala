package graft.plans

import graft.SparkSpec
import graft.ops.Pivots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._

/** The §4.3 pivot-fusion rule: a join of same-key aggregates over the same
  * input collapses to one aggregate (one scan, one exchange). */
class PivotFusionSpec extends SparkSpec {
  import spark.implicits._

  private def events: DataFrame = Seq(
    (1L, "click", 1.0), (1L, "view", 2.0), (1L, "click", 3.0),
    (2L, "view", 4.0), (2L, "purchase", 5.0), (3L, "click", 6.0))
    .toDF("user_id", "event_type", "value")

  private val vocab = Seq("click", "purchase", "view")

  private def countAggs(p: org.apache.spark.sql.execution.QueryExecution) =
    (p.optimizedPlan.collect { case a: Aggregate => a }.size,
      p.optimizedPlan.collect { case j: Join => j }.size)

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PivotFusion
    try body finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PivotFusion)
    }
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("user_id").collect().toSeq.map(_.toSeq)

  test("two pivot families joined on the key fuse into one aggregate") {
    val e = events
    def composed = Pivots.pivotCount(e, "user_id", "event_type", vocab,
        "value", "cnt")
      .join(Pivots.pivotSum(e, "user_id", "event_type", vocab,
        "value", "amt"), Seq("user_id"))
    val baseline = sortedRows(composed)
    withRule {
      val q = composed
      val (aggs, joins) = countAggs(q.queryExecution)
      assert(joins == 0, s"join survived:\n${q.queryExecution.optimizedPlan}")
      assert(aggs == 1, s"expected ONE aggregate, got $aggs")
      assert(sortedRows(q) == baseline, "fusion must not change results")
      // physical: exactly one exchange for the whole two-family matrix
      val exchanges = q.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
    }
  }

  test("three chained families collapse bottom-up into a single aggregate") {
    // parquet-backed (the production shape: ColumnPruning leaves each
    // side a Project over the SAME relation — a LocalRelation would be
    // pruned into per-side relations instead)
    val dir = s"${sys.props("java.io.tmpdir")}/graft_pivot_fusion_e"
    events.write.mode("overwrite").parquet(dir)
    val e = spark.read.parquet(dir)
    def composed = Pivots.pivotCount(e, "user_id", "event_type", vocab,
        "value", "cnt")
      .join(Pivots.pivotSum(e, "user_id", "event_type", vocab,
        "value", "amt"), Seq("user_id"))
      .join(e.groupBy(col("user_id"))
        .agg(avg(col("value")).as("v_mean")), Seq("user_id"))
    val baseline = sortedRows(composed)
    withRule {
      val q = composed
      val (aggs, joins) = countAggs(q.queryExecution)
      assert(joins == 0 && aggs == 1,
        s"aggs=$aggs joins=$joins:\n${q.queryExecution.optimizedPlan}")
      assert(sortedRows(q) == baseline)
      // the three-family matrix is ONE scan of the input: a single
      // FileScan in the physical plan (vs three without the rule)
      val scans = q.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Scan parquet"))
      assert(scans == 1, s"expected 1 scan, got $scans")
    }
    rmTree(new java.io.File(dir))
  }

  test("null grouping keys: fused plan keeps inner-join semantics") {
    val e = Seq[(Option[Long], String, Double)](
      (Some(1L), "click", 1.0), (None, "view", 2.0), (Some(2L), "click", 3.0))
      .toDF("user_id", "event_type", "value")
    def composed = Pivots.pivotCount(e, "user_id", "event_type", vocab,
        "value", "cnt")
      .join(Pivots.pivotSum(e, "user_id", "event_type", vocab,
        "value", "amt"), Seq("user_id"))
    val baseline = sortedRows(composed) // inner join drops the NULL group
    withRule {
      val q = composed
      assert(countAggs(q.queryExecution)._2 == 0, "should still fuse")
      assert(sortedRows(q) == baseline,
        "NULL-key group must stay dropped (IsNotNull filter)")
      assert(q.count() == 2)
    }
  }

  test("different inputs do NOT fuse") {
    val e = events
    def composed = Pivots.pivotCount(e, "user_id", "event_type", vocab,
        "value", "cnt")
      .join(Pivots.pivotSum(e.filter(col("value") > 1.0), "user_id",
        "event_type", vocab, "value", "amt"), Seq("user_id"))
    val baseline = sortedRows(composed)
    withRule {
      val q = composed
      assert(countAggs(q.queryExecution)._2 == 1,
        s"must keep the join:\n${q.queryExecution.optimizedPlan}")
      assert(sortedRows(q) == baseline)
    }
  }

  test("outer joins and non-key conditions do NOT fuse") {
    val e = events
    val l = Pivots.pivotCount(e, "user_id", "event_type", vocab,
      "value", "cnt")
    val r = Pivots.pivotSum(e, "user_id", "event_type", vocab,
      "value", "amt")
    withRule {
      val left = l.join(r, Seq("user_id"), "left")
      assert(left.queryExecution.optimizedPlan
        .collect { case j: Join => j }.size == 1, "left join kept")
      val nonKey = l.join(r, l("cnt_click") === r("amt_view"))
      assert(nonKey.queryExecution.optimizedPlan
        .collect { case j: Join => j }.size == 1, "non-key condition kept")
    }
  }

  test("nondeterministic input does NOT fuse (two scans differ)") {
    val e = events.withColumn("r", rand(7)).filter(col("r") >= 0)
    def composed = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .join(e.groupBy(col("user_id"))
        .agg(sum(col("value")).as("s")), Seq("user_id"))
    withRule {
      assert(composed.queryExecution.optimizedPlan
        .collect { case j: Join => j }.nonEmpty, "rand() input kept apart")
    }
  }
}
