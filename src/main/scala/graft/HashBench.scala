package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated MinHash SIGNATURE-PASS bench: md5 oracle-parity family vs the
  * production xxhash64 family over an N×-replicated documents corpus
  * (default 20× sf0.1 ≈ 100k docs), same projection shape both ways.
  * The registered d06/d49 bench rows measure the full LSH operator, where
  * the band join dominates at small SF; this isolates the stage the
  * family choice actually touches. Prints one JSON line.
  *
  * Usage: sbt "runMain graft.HashBench [sfDir] [replicas] [k]" */
object HashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val k = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val docs = (0 until replicas)
      .map(i => docs0.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        $"text"))
      .reduce(_.union(_)).repartition(cpus.toInt).localCheckpoint(true)
    val n = docs.count()

    val shArr = array_distinct(
      graft.ops.TextOps.shingles(graft.ops.TextOps.tokens($"text"), 3))
    def run(sig: org.apache.spark.sql.DataFrame): Unit =
      sig.write.format("noop").mode("overwrite").save()
    def best(f: => Unit): Double =
      (0 until 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // warmup (codegen + JIT) on one replica
    run(docs0.select(graft.functions.MinHashSigs.minhashSigs(shArr, k)))

    // registered d06 path: native codegen md5-family expression
    val md5Native = best { run(docs.select($"doc_id",
      graft.functions.MinHashSigs.minhashSigs(shArr, k).as("_sig"))) }
    // registered d49 path: xxhash64 through the generic two-step
    // projection (materialized shingle array, k transform+array_min)
    def generic(fam: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      docs.select($"doc_id", shArr.as("_sh")).localCheckpoint(true)
        .select($"doc_id", array((0 until k).map(j =>
          array_min(transform($"_sh", x => fam(x, lit(j))))): _*).as("_sig"))
    val xxh = best { run(generic(graft.ops.Dedup.xxhashFamily)) }
    // md5 family through the SAME generic path — isolates hash family
    // from expression form
    val md5Generic = best { run(generic(graft.ops.Dedup.md5Hash)) }

    // d103/q91 slot-draw path: 64 hash evaluations per row folded into
    // ONE keyed aggregate of min(struct(hash, key, v)) — the quantile
    // sketch's production-swap claim (SCALE.md: "swap md5 → xxhash64")
    // measured in the sketch's own shape, not the signature pass's
    def slotRun(fam: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column) = {
      val base = docs.select(($"doc_id" % 64).as("grp"),
        $"doc_id".cast("string").as("_k"),
        length($"text").cast("double").as("_v"))
      val winners = (0 until 64).map(i => min(struct(
        fam($"_k", lit(s"qs$i")).as("h"),
        $"_k".as("k"), $"_v".as("v"))).as(s"_w$i"))
      base.groupBy($"grp")
        .agg(count(lit(1)).as("n_rows"), winners: _*)
    }
    run(slotRun(graft.ops.Dedup.md5Hash).limit(1)) // warmup
    val slotMd5 = best { run(slotRun(graft.ops.Dedup.md5Hash)) }
    val slotXxh = best { run(slotRun(graft.ops.Dedup.xxhashFamily)) }

    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"docs":$n,"k":$k,"md5_native_sec":${f(md5Native)},""" +
      s""""xxhash64_sec":${f(xxh)},"md5_generic_sec":${f(md5Generic)},""" +
      s""""speedup_vs_native":${f(md5Native / xxh)},""" +
      s""""speedup_same_shape":${f(md5Generic / xxh)},""" +
      s""""slot_md5_sec":${f(slotMd5)},"slot_xxh_sec":${f(slotXxh)},""" +
      s""""slot_speedup":${f(slotMd5 / slotXxh)}}""")
    spark.stop()
  }
}
