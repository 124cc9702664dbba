package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{SparkEntry, SparkSpec}

/** Reads the REAL driver testdata (not fixtures) so that testdata schema
  * drift fails `sbt test` instead of silently failing the round — in round 7
  * the driver regenerated `events.parquet` with `ts` as timestamp[us]
  * WITHOUT timezone (Spark 4: TIMESTAMP_NTZ) and eleven green queries
  * started throwing `DATATYPE_MISMATCH` at driver time while the suite
  * stayed green, because no test touched the actual files.
  *
  * Three layers of guard, cheapest first:
  *  1. declared-schema assertions per table (key columns + types);
  *  2. the exact expressions that broke (`unix_micros(ts)`, CSV timestamp
  *     roundtrip) EXECUTED, since q40's failure mode was all-NULL output —
  *     an analysis-time check cannot see it;
  *  3. an analysis pass over every registry query: `.schema` forces full
  *     Catalyst analysis (where DATATYPE_MISMATCH throws) without running
  *     the job, so 150+ queries stay cheap.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(sfDir).isDirectory

  test("driver testdata: all tables load and carry their key columns") {
    assume(available)
    val expect = Map(
      "events" -> Seq("user_id", "ts", "event_type", "value"),
      "documents" -> Seq("doc_id", "text"),
      "embeddings" -> Seq("vec_id", "embedding", "label"),
      "lineitem" -> Seq("l_orderkey", "l_quantity", "l_returnflag"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey", "c_nationkey"),
      "supplier" -> Seq("s_suppkey", "s_nationkey"),
      "part" -> Seq("p_partkey"),
      "nation" -> Seq("n_nationkey", "n_regionkey"),
      "region" -> Seq("r_regionkey"))
    for ((t, cols) <- expect) {
      val have = Tables.load(spark, sfDir, t).columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"table $t lost columns $missing (has $have)")
    }
  }

  test("events.ts normalizes to TIMESTAMP whatever the parquet encoding") {
    assume(available)
    val e = Tables.events(spark, sfDir)
    assert(e.schema("ts").dataType == TimestampType,
      s"ts must normalize to TIMESTAMP, got ${e.schema("ts").dataType}")
    // the exact call that threw in round 7, executed:
    val r = e.agg(count(unix_micros(col("ts"))).as("n"),
      min(unix_micros(col("ts"))).as("lo")).head()
    assert(r.getLong(0) > 0, "unix_micros(ts) produced zero non-null rows")
    // sanity range: 2000-01-01 .. 2100-01-01 in epoch micros
    assert(r.getLong(1) > 946684800000000L && r.getLong(1) < 4102444800000000L,
      s"ts epoch out of range: ${r.getLong(1)}")
  }

  test("events ts survives the CSV write/read roundtrip (q40 surface)") {
    assume(available)
    val dir = s"${sys.props("java.io.tmpdir")}/graft_testdata_csv_rt"
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value")).limit(50)
    Tables.writeCsv(e, dir)
    val back = spark.read
      .schema(StructType(Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("value", DoubleType))))
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(dir)
    val nulls = back.where(col("ts").isNull).count()
    assert(back.count() == 50 && nulls == 0,
      s"CSV roundtrip dropped timestamps: $nulls null of ${back.count()}")
    rmTree(new java.io.File(dir))
  }

  test("SparkEntry.entry returns rows (the driver's smoke check)") {
    assume(available)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registry query analyzes against the real testdata") {
    assume(available)
    // eager registry entries execute jobs at construction (bucketed-table
    // writes, persisted indices, centroid pulls) — still cheap at sf0.001.
    val failed = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try { fn(spark, sfDir).schema; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failed.isEmpty,
      s"${failed.size} queries no longer analyze:\n${failed.mkString("\n")}")
  }
}
