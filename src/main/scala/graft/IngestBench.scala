package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition counts for the streaming-ingest family (r17 verdict
  * ask #2): s24/s25's decade-2 time ratios (5.3x/6.4x at sf1→sf10) were
  * ATTRIBUTED to codec-linear arrival growth + per-scale width
  * re-derive; this main measures the attribution the way SCALE.md's
  * e26 row does — explicit row/candidate counts per scale so each
  * factor has a named, measured driver (time and shuffle bytes come
  * from `graft.Bench` with SPARK_GRAFT_BENCH_METRICS=1; this tool is
  * deliberately untimed so it can run in any machine window).
  *
  * Per scale it prints ONE JSON line:
  *  - n_docs / n_arrivals / n_admitted — corpus, gate input, gate pass
  *  - codec_rows — fused tower passes (corpus + arrivals; the s25 plan
  *    runs the codec ONCE per row and re-buckets, so this must be
  *    exactly n_docs + n_arrivals at every scale — a re-encode
  *    regression would double it)
  *  - bits_gate / bits_serve — the self-tuned widths the two joins use
  *  - gate_candidates — bucket-equality pairs the dup gate examines
  *  - serve_candidates — bucket-equality pairs the serving top-1 join
  *    examines (after the hot-bucket cap)
  *  - capped_buckets / capped_rows — posting-cap pressure on the grown
  *    index (what keeps serve_candidates linear)
  *
  * Usage: runMain graft.IngestBench [sfDir] */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.schema.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val bits0 = QueriesVectors.adaptiveTowerBits(nDocs)
    val arrDims = QueriesVectors.ingestArrivalDims(docs)
      .localCheckpoint(true)
    val nArr = arrDims.count()
    val cdims = QueriesVectors.towerDims(docs)
    val corpusTower = QueriesVectors
      .imageTowerFromDims(cdims, bits0).localCheckpoint(true)
    val arrTower = QueriesVectors
      .imageTowerFromDims(arrDims, bits0).localCheckpoint(true)
    // the dup gate's candidate set: bucket-equality pairs BEFORE the
    // exact-parallel predicate (what the shuffle actually carries)
    val gateCand = arrTower.select(col("ibucket"))
      .join(corpusTower.select(col("ibucket").as("cb")),
        col("ibucket") === col("cb")).count()
    val admitted = QueriesVectors
      .admittedArrivalTower(arrDims, corpusTower, bits0)
      .localCheckpoint(true)
    val nAdm = admitted.count()
    val bits1 = QueriesVectors.adaptiveTowerBits(nDocs + nAdm)
    def rebucket(t: org.apache.spark.sql.DataFrame) =
      t.withColumn("ibucket",
        QueriesVectors.towerBucket(col("ivec"), bits1))
    val newIdx = rebucket(corpusTower.unionByName(admitted))
      .localCheckpoint(true)
    val depth = newIdx.groupBy(col("ibucket")).count()
    val capped = depth.filter(col("count") > QueriesVectors.TOWER_MAX_POSTINGS)
      .agg(coalesce(count(lit(1)), lit(0L)).as("nb"),
        coalesce(sum(col("count")), lit(0L)).as("nr"))
      .head
    val hot = depth.filter(col("count") > QueriesVectors.TOWER_MAX_POSTINGS)
      .select(col("ibucket"))
    val idxOk = newIdx.join(hot, Seq("ibucket"), "left_anti")
    val serveCand = rebucket(admitted).select(col("ibucket"))
      .join(idxOk.select(col("ibucket").as("ib")),
        col("ibucket") === col("ib")).count()
    val line = String.format(java.util.Locale.ROOT,
      """{"sf":"%s","n_docs":%d,"n_arrivals":%d,"n_admitted":%d,""" +
        """"codec_rows":%d,"bits_gate":%d,"bits_serve":%d,""" +
        """"gate_candidates":%d,"serve_candidates":%d,""" +
        """"capped_buckets":%d,"capped_rows":%d}""",
      sfDir, Long.box(nDocs), Long.box(nArr), Long.box(nAdm),
      Long.box(nDocs + nArr), Int.box(bits0), Int.box(bits1),
      Long.box(gateCand), Long.box(serveCand),
      Long.box(capped.getAs[Long]("nb")), Long.box(capped.getAs[Long]("nr")))
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
