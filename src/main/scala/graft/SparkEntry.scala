package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.ops._
import graft.schema.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query bodies live in Queries (relational inventory, SURVEY.md §2) and
  * QueriesText (training-data-pipeline operators). */
object SparkEntry {

  // lazy (as is every sub-registry defs): the sub-registries cross-
  // reference each other's factored SQL, so a STRICT concatenation can
  // observe a mid-clinit null when an entry point touches a sub-registry
  // object first (the r11 graft.Train NPE class — LearnSpec/s16 hit it
  // again through QueriesPrep; laziness makes init order irrelevant).
  private lazy val all: Seq[(String, (SparkSession, String) => DataFrame,
    Option[String])] = Queries.defs ++ QueriesText.defs ++ QueriesStream.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY.md §7.3 spine: scan → time attrs → per-group trim →
    * fixed-vocab pivot-count → floor-div quantize → row-normalize. */
  def entry(spark: SparkSession): DataFrame = {
    val e = TimeFeatures.withTimeAttrs(
      Tables.events(spark, "/root/testdata/sf0.001"), "ts")
    val trimmed = Trim.headTail(e, 5, Seq("user_id"),
      Seq(col("ts"), col("event_id")))
    val pv = Pivots.pivotCount(trimmed, "user_id", "event_type",
      Tables.eventTypeVocab, "value", "freq")
    val quantized = Pivots.floorDiv(pv,
      Tables.eventTypeVocab.map(v => s"freq_$v"), 2)
    RowNorm.rowNormalize(quantized,
      Tables.eventTypeVocab.map(v => s"freq_$v"), "freq_sum")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(all.map { case (n, fn, _) => n -> fn }: _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (array-typed outputs, seeded sampling, RDD stages) → rows-only check. */
  def oracleSql: Map[String, String] =
    ListMap(all.collect { case (n, _, Some(sql)) => n -> sql }: _*)
}
