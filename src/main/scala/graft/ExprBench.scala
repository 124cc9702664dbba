package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scalar-kernel bench for the §2.11 "functions, not UDFs"
  * policy: the SAME cosine-scoring pass (dot product of every corpus
  * vector against a broadcast query vector, sum aggregated) through the
  * three implementation tiers —
  *
  *   1. native codegen Expression (graft.functions.DotProduct — the
  *      registered e-series path),
  *   2. built-in higher-order functions (aggregate ∘ zip_with — what the
  *      DotProductRewrite rule rewrites INTO tier 1),
  *   3. a Scala UDF (the tier the repo bans from relational paths).
  *
  * The registered e-series bench rows measure whole operators, where
  * joins dominate; this isolates the per-row kernel the policy is about.
  * Prints one JSON line. Usage:
  * sbt "runMain graft.ExprBench [sfDir] [replicas]" */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val emb = (0 until replicas)
      .map(i => emb0.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
        $"embedding"))
      .reduce(_.union(_)).repartition(cpus.toInt).localCheckpoint(true)
    val n = emb.count()
    val q = emb0.limit(1).select($"embedding").head.getSeq[Float](0)
    val qLit = array(q.map(v => lit(v)): _*)

    def best(f: => Unit): Double =
      (0 until 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def run(c: org.apache.spark.sql.Column): Unit =
      emb.select(sum(c)).write.format("noop").mode("overwrite").save()

    val native = graft.ops.Similarity.dot($"embedding", qLit)
    val hof = aggregate(
      zip_with($"embedding", qLit,
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val dotUdf = udf((a: Seq[Float]) => {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * q(i).toDouble; i += 1 }
      s
    })

    // symmetric warmup: every tier pays its codegen/JIT compile before
    // ANY timing — an asymmetric warmup would hand the first-timed tier
    // a best-of-4 while the others amortize compilation into their min
    run(native); run(hof); run(dotUdf($"embedding"))
    val tNative = best(run(native))
    val tHof = best(run(hof))
    val tUdf = best(run(dotUdf($"embedding")))

    // Same two-tier isolation for the jaro_winkler kernel (no HOF tier —
    // the algorithm isn't expressible in built-ins): IDENTICAL algorithm
    // both ways (the UDF calls the same static method), so the measured
    // gap is purely the UDF boundary (UTF8String→String conversion, the
    // non-codegen call path) — the tax the native expression deletes.
    val names0 = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_name")
    val names = (0 until replicas)
      .map(i => names0.select(($"c_custkey" + lit(i * 1000000L))
        .as("c_custkey"), $"c_name"))
      .reduce(_.union(_)).repartition(cpus.toInt).localCheckpoint(true)
    val nNames = names.count()
    val qName = names0.limit(1).select($"c_name").head.getString(0)
    val jwNative = graft.functions.JaroWinkler($"c_name", lit(qName))
    val qU = org.apache.spark.unsafe.types.UTF8String.fromString(qName)
    val jwUdf = udf((a: String) => graft.functions.JaroWinkler
      .similarity(org.apache.spark.unsafe.types.UTF8String.fromString(a), qU))
    def runJw(c: org.apache.spark.sql.Column): Unit =
      names.select(sum(c)).write.format("noop").mode("overwrite").save()
    runJw(jwNative); runJw(jwUdf($"c_name"))
    val tJwNative = best(runJw(jwNative))
    val tJwUdf = best(runJw(jwUdf($"c_name")))

    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"vectors":$n,"dims":${q.length},""" +
      s""""native_sec":${f(tNative)},"hof_sec":${f(tHof)},""" +
      s""""udf_sec":${f(tUdf)},""" +
      s""""hof_vs_native":${f(tHof / tNative)},""" +
      s""""udf_vs_native":${f(tUdf / tNative)},""" +
      s""""jw_rows":$nNames,""" +
      s""""jw_native_sec":${f(tJwNative)},"jw_udf_sec":${f(tJwUdf)},""" +
      s""""jw_udf_vs_native":${f(tJwUdf / tJwNative)}}""")
    spark.stop()
  }
}
