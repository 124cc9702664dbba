package graft

import org.apache.spark.sql.SparkSession

/** Isolated cross-modal matcher bench: the bucket-WIDTH scale knob
  * measured (c05/s22's `towerBucket(vec, bits)`). Candidate pairs grow
  * with Σ bucket² — quadratic in corpus size at FIXED width — so the
  * production path widens the sign pattern; this main times the
  * registered width (6 bits = 64 buckets) against a production width
  * (default 12 bits = 4096 buckets) on the same corpus and reports the
  * candidate-pair counts beside the runtimes. Prints one JSON line.
  *
  * Usage: sbt "runMain graft.XModalBench [sfDir] [wideBits]" */
object XModalBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val wideBits = args.lift(1).map(_.toInt).getOrElse(12)
    // optional 3rd arg: narrow baseline width; 0 skips it — at the 100x
    // fixture the 6-bit uncapped baseline is a deliberate ~10^9-pair
    // quadratic and timing it teaches nothing new
    val narrowBits = args.lift(2).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.schema.Tables.documents(spark, sfDir)
    // manual widths run UNCAPPED (cap = 0) so the bench isolates the
    // width knob: at a mis-fit narrow width on a big corpus the
    // registered hot-bucket cap would (correctly) drop every bucket
    // and leave nothing to time. The adaptive run keeps the registered
    // behavior (cap on) — at the self-tuned width the cap never bites.
    def run(bits: Int, cap: Long): (Double, Long) = {
      def report = QueriesVectors.crossModalReport(docs, docs, bits, cap)
      def once(): Double = {
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        report.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = (0 until 3).map(_ => once()).min
      val pairs = report
        .agg(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum("n_pairs"),
          org.apache.spark.sql.functions.lit(0L)))
        .collect()(0).getLong(0)
      (best, pairs)
    }
    val (tNarrow, pNarrow) =
      if (narrowBits > 0) run(narrowBits, 0L) else (Double.NaN, -1L)
    val (tWide, pWide) = run(wideBits, 0L)
    // the REGISTERED behavior since r16: the operator derives the width
    // itself (adaptiveTowerBits over the image-corpus count). Measured
    // here beside the manual widths so the round artifact can assert
    // self-tuned ≡ hand-picked at the 10× corpus (50k docs → 12 bits,
    // the width r15 measured at 59× fewer candidates / 6.3× faster).
    val aBits = QueriesVectors.adaptiveTowerBits(docs.count())
    val (tAdaptive, pAdaptive) =
      run(aBits, QueriesVectors.TOWER_MAX_POSTINGS)
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val narrowPart =
      if (narrowBits > 0)
        s""""narrow_bits":$narrowBits,"narrow_sec":${f(tNarrow)},""" +
          s""""narrow_pairs":$pNarrow,"speedup":${f(tNarrow / tWide)},"""
      else """"narrow_bits":0,"""
    println(s"""{"sf":"$sfDir",$narrowPart"wide_bits":$wideBits,""" +
      s""""wide_sec":${f(tWide)},"wide_pairs":$pWide,""" +
      s""""adaptive_bits":$aBits,"adaptive_sec":${f(tAdaptive)},""" +
      s""""adaptive_pairs":$pAdaptive,""" +
      s""""adaptive_eq_wide":${aBits == wideBits && pAdaptive == pWide}}""")
    spark.stop()
  }
}
