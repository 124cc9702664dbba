package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TimeFeatures
import graft.pipeline.{Pipeline, TreeEnsembleModel, TreeEnsembleScorer}
import graft.schema.Tables

/** Standalone CLI replicating the reference's two-arg submission contract
  * (`run.py:17`: `python run.py in.csv out.csv`): read a transactions CSV in
  * the reference schema (`model.py:208-212`), run the §3.1 pipeline
  * (clean → per-user feature matrix → committed-model scoring → max-score
  * fallback for users the cleaning dropped → user-sorted CSV).
  *
  * The feature surface is MODEL-DRIVEN, same as the reference: `run.py:476`
  * takes the column list from `model_cb.get_feature_importance` and
  * zero-fills anything missing. Here the committed [[TreeEnsembleModel]]
  * artifact declares `featureNames`, the `freq_*` names induce the pivot
  * vocabulary, and [[Pipeline.alignFeatures]] zero-fills the rest — so
  * swapping the artifact (e.g. one trained on real MCC codes via
  * `TreeEnsembleModel.fromSparkML` + `toLines`) retargets the whole CLI
  * without a rebuild: `graft.Submit in.csv out.csv /path/to/model.txt`.
  *
  * Scale shape: one scan of the CSV, one shuffle on user_id (the fused
  * feature matrix), scoring as a codegen projection, and the fallback join
  * broadcast — the reference's per-user Python loop (`run.py:35-80`)
  * becomes three distributed stages.
  */
object Submit {

  /** The reference's service-code exclusion (`run.py:201`: MCC 6012). */
  val DefaultDropCodes: Seq[String] = Seq("6012")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Submit <transactions.csv> <output.csv> [model.txt]")
    val (inCsv, outCsv) = (args(0), args(1))
    val model = args.lift(2).map(TreeEnsembleModel.fromFile)
      .getOrElse(TreeEnsembleModel.fromResource("/graft/tree_model.txt"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.writeCsv(run(spark, inCsv, model), outCsv, singleFile = true)
    spark.stop()
  }

  /** The full dataflow, sink-free so specs can assert on the DataFrame. */
  def run(spark: SparkSession, inCsv: String, model: TreeEnsembleModel,
          dropCodes: Seq[String] = DefaultDropCodes): DataFrame = {
    val tx = Tables.readTransactionsCsv(spark, inCsv)
    // pipeline column contract; codes travel as strings so one vocabulary
    // mechanism serves MCC longs and categorical stand-ins alike
    val in = tx.select(col("user_id"),
      col("mcc_code").cast("string").as("code"),
      col("transaction_amt").as("amt"),
      col("transaction_dttm").as("ts"))
    val vocab = model.featureNames.collect {
      case f if f.startsWith("freq_") => f.stripPrefix("freq_")
    }
    val cleaned = Pipeline.clean(in, "user_id", "code", "amt",
      Seq(col("ts")), Pipeline.Config(nAmt = 10, nMcc = 10, trimN = 20,
        dropCodes = dropCodes)).cache()
    val features = Pipeline.featureMatrixFused(cleaned, "user_id", "code",
      "amt", TimeFeatures.secondsSinceMidnight(col("ts")), vocab)
    val aligned = Pipeline.alignFeatures(features, "user_id",
      model.featureNames)
    Pipeline.submission(aligned, TreeEnsembleScorer(model), in, "user_id")
  }
}
