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

  /** Every sf dir the driver generated — each is produced independently,
    * so encoding drift can hit one scale and not another (the spec pins
    * sf0.001 for probes, the driver verifies at sf0.01, the bench runs
    * sf0.1). */
  private def sfDirs: Seq[String] =
    Option(new java.io.File("/root/testdata").listFiles())
      .map(_.toSeq.filter(f => f.isDirectory && f.getName.startsWith("sf"))
        .map(_.getAbsolutePath).sorted)
      .getOrElse(Nil)

  /** The full post-loader schema contract, every table × every column —
    * the types the 173-query registry compiles against. A failure names
    * the exact (sfDir, table, column, got) that drifted. `events.ts` is
    * the NORMALIZED type (Tables.events dispatches on the physical
    * encoding); everything else is the raw parquet→Spark mapping. */
  private val expectTypes: Map[String, Seq[(String, DataType)]] = Map(
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))

  test("driver testdata: every table × column × sf dir matches the declared type") {
    assume(available)
    val drifted = for {
      dir <- sfDirs
      (t, cols) <- expectTypes.toSeq
      schema = (if (t == "events") Tables.events(spark, dir)
                else Tables.load(spark, dir, t)).schema
      (c, want) <- cols
      got = schema.find(_.name == c).map(_.dataType)
      if !got.contains(want)
    } yield s"$dir/$t.$c: want $want, got ${got.getOrElse("MISSING")}"
    assert(drifted.isEmpty,
      s"${drifted.size} drifted columns:\n${drifted.mkString("\n")}")
  }

  test("driver testdata: every column yields non-null values when READ") {
    assume(available)
    // An analysis-level type match can still hide all-NULL reads (round
    // 7's q40 failure mode) — execute one non-null count per column.
    val empty = for {
      (t, cols) <- expectTypes.toSeq
      df = if (t == "events") Tables.events(spark, sfDir)
           else Tables.load(spark, sfDir, t)
      row = df.select(cols.map { case (c, _) =>
        count(col(c)).as(c) }: _*).head()
      ((c, _), i) <- cols.zipWithIndex
      if row.getLong(i) == 0L
    } yield s"$t.$c"
    assert(empty.isEmpty, s"columns read as all-NULL: ${empty.mkString(", ")}")
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
