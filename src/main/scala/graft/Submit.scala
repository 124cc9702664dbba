package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Bucketize, Sequences, TimeFeatures}
import graft.pipeline.{LatentEncoderModel, LatentTransformer, Pipeline,
  SequenceModel, SequenceScorer, TreeEnsembleModel, TreeEnsembleScorer,
  VraeFeatures}
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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Artifact type dispatch: a `seqmodel` header selects the RNN branch
    // (model.py predict contract), anything else the tree branch
    // (run.py CatBoost contract). Same two-arg CLI either way.
    val result = (args.lift(2), args.lift(3)) match {
      case (Some(p), _) if SequenceModel.isSequenceArtifact(p) =>
        runSeq(spark, inCsv, SequenceModel.fromFile(p))
      case (Some(p), Some(v)) =>
        // a 4th argument is an explicit request for the latent branch —
        // a wrong/corrupt encoder must fail LOUD here, not fall through
        // to the plain tree branch and silently score z_* as zero-fill
        require(LatentEncoderModel.isLatentArtifact(v),
          s"4th argument is not a latent encoder artifact " +
            s"(expected a 'latentmodel' header): $v")
        runWithLatent(spark, inCsv, TreeEnsembleModel.fromFile(p),
          LatentEncoderModel.fromFile(v))
      case (Some(p), None) => run(spark, inCsv, TreeEnsembleModel.fromFile(p))
      case (None, _) =>
        run(spark, inCsv, TreeEnsembleModel.fromResource("/graft/tree_model.txt"))
    }
    Tables.writeCsv(result, outCsv, singleFile = true)
    spark.stop()
  }

  /** The shared tree-branch prelude (read → column contract → clean →
    * fused per-user feature matrix), extracted so [[run]] and
    * [[runWithLatent]] cannot drift on the cleaning constants or the
    * column contract. Returns (raw tx, contract-projected input, feature
    * matrix). */
  private def treePrelude(spark: SparkSession, inCsv: String,
                          model: TreeEnsembleModel, dropCodes: Seq[String])
  : (DataFrame, DataFrame, DataFrame) = {
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
    (tx, in, features)
  }

  /** The full dataflow, sink-free so specs can assert on the DataFrame. */
  def run(spark: SparkSession, inCsv: String, model: TreeEnsembleModel,
          dropCodes: Seq[String] = DefaultDropCodes): DataFrame = {
    val (_, in, features) = treePrelude(spark, inCsv, model, dropCodes)
    val aligned = Pipeline.alignFeatures(features, "user_id",
      model.featureNames)
    Pipeline.submission(aligned, TreeEnsembleScorer(model), in, "user_id")
  }

  /** The VRAE-enriched tree branch (`run.py:435-476`): the standard tree
    * feature matrix CONCATENATED with the per-user 40-dim latent means from
    * the native LSTM encoder (`run.py:176-178` z_run → `run.py:463-466`
    * model_cb_vrae), inner-joined like the reference's concat-then-dropna
    * (users missing either side fall to the max-score fallback,
    * `run.py:478-482`). Latent features are named `z_0..z_{L-1}`;
    * tools/convert_catboost_json.py maps model_cb_vrae's integer feature
    * ids onto the same names, so a converted VRAE CatBoost artifact plugs
    * straight in:
    *   graft.Submit in.csv out.csv model_vrae.txt vrae_encoder.txt.gz
    * Scale: the latent branch adds ONE more user_id-partitioned stage (the
    * encoder forward) and a co-partitioned user_id join — no new exchange
    * class. */
  def runWithLatent(spark: SparkSession, inCsv: String,
                    model: TreeEnsembleModel, encoder: LatentEncoderModel,
                    dropCodes: Seq[String] = DefaultDropCodes): DataFrame = {
    val (tx, in, features) = treePrelude(spark, inCsv, model, dropCodes)
    val latent = LatentTransformer(encoder)
      .transform(VraeFeatures.assemble(tx)).drop("seq")
    val enriched = features.join(latent, Seq("user_id"), "inner")
    val aligned = Pipeline.alignFeatures(enriched, "user_id",
      model.featureNames)
    Pipeline.submission(aligned, TreeEnsembleScorer(model), in, "user_id")
  }

  /** The RNN branch (`model.py:207-244` predict): dropna → calendar
    * attrs (hour / dayofweek / month / dayofmonth, `model.py:216-220`) →
    * pd.cut digitization by the artifact's per-feature edges
    * (`model.py:172-181`; features without edges arrive pre-indexed) →
    * last-`seqLen` RIGHT-padded index sequences (`model.py:185-196`) →
    * native [[SequenceModel]] forward pass → per-user class-1
    * probability, with the usual max-score fallback for users the
    * cleaning dropped (`run.py:478-482`). Out-of-range values digitize
    * to the padding index 0 (pandas would crash on `.astype(int)` of the
    * resulting NaN; a distributed batch job should not).
    *
    * The committed full-size artifact (`/graft/seq_model_tx.txt.gz`,
    * converted from the reference checkpoint by
    * `tools/convert_nn_ckpt.py`) makes this branch runnable as
    * `graft.Submit in.csv out.csv seq_model_tx.txt.gz`. Deterministic
    * eval semantics: the reference's functional dropout at
    * `model.py:74` stays live even under `model.eval()` (torch quirk it
    * papers over with seeding + the 50-rep bootstrap average in
    * `reliable_predict`); this engine computes the eval intent
    * (dropout = identity), so scores are reproducible. */
  def runSeq(spark: SparkSession, inCsv: String,
             model: SequenceModel): DataFrame = {
    val tx = Tables.readTransactionsCsv(spark, inCsv)
    val cleaned = tx.na.drop()
    val withAttrs = cleaned
      .withColumn("hour", hour(col("transaction_dttm")))
      .withColumn("day", TimeFeatures.dayOfWeekMon0(col("transaction_dttm")))
      .withColumn("month", month(col("transaction_dttm")))
      .withColumn("number_day", dayofmonth(col("transaction_dttm")))
    val digitized = model.features.foldLeft(withAttrs) { (df, f) =>
      model.edges.get(f) match {
        case Some(e) => df.withColumn(f,
          coalesce(Bucketize(col(f).cast("double"), e.toSeq), lit(0))
            .cast("int"))
        case None => df.withColumn(f, col(f).cast("int"))
      }
    }
    val seqs = Sequences.assembleSequences(digitized, model.seqLen,
      Seq("user_id"), struct(col("transaction_dttm")), model.features,
      padLeft = false)
    // fallback universe = RAW input users: dropna is exactly what loses them
    Pipeline.submission(seqs, SequenceScorer(model), tx, "user_id")
  }
}
