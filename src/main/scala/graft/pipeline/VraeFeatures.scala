package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Sequences, TimeFeatures}

/**
 * The reference's VRAE feature assembly (`run.py:90-126`), re-expressed as
 * one declarative plan over the transactions frame:
 *
 *  - calendar attrs + `timediff` (whole hours since the frame's reference
 *    instant) + `time_day` (seconds since midnight) + signed debit/credit
 *    split, zero-filled (`run.py:90-99,108`);
 *  - one-hot dummies reindexed onto the FIXED 391-column template
 *    (`run.py:104-107`, committed verbatim as /graft/vrae_cols.txt by
 *    tools/extract_vrae_cols.py) — unseen categories drop, missing ones
 *    zero-fill, exactly like `reindex(columns=cols)`;
 *  - per-user population-σ scaling of (amt, debit, credit) (sklearn
 *    StandardScaler, `run.py:113-115`; σ=0 → scale 1 → centered 0);
 *  - per-user cumulative sums of the three scaled columns APPENDED as
 *    features 391-393 (`run.py:116-118`);
 *  - per-user rebase of `timediff` to the user's first row (`run.py:120`).
 *
 * Reference instant: the reference uses the file's physical first row
 * (`transactions_vrae['transaction_dttm'][0]`, `run.py:96`); a distributed
 * scan has no "first row", so the engine uses min(transaction_dttm) — the
 * same policy as the oracle-checked q36 twin. The rebase at `run.py:120`
 * cancels the reference instant except for hour-bucket boundary alignment.
 *
 * Row order within a user: (transaction_dttm, mcc_code, transaction_amt) —
 * a total order on the data the reference processes positionally.
 *
 * Scale: the one-hot reindex is a 394-wide codegen projection (no shuffle);
 * the per-user stats/cumsums/assembly share ONE user_id exchange.
 */
object VraeFeatures {

  /** The run.py:104 template, verbatim. */
  lazy val template: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/vrae_cols.txt")
    require(in != null, "resource not found: /graft/vrae_cols.txt")
    val src = scala.io.Source.fromInputStream(in)
    try src.getLines().map(_.trim).filter(_.nonEmpty).toList
    finally src.close()
  }

  /** Encoder input order: template ++ the 3 appended cumsums. */
  lazy val featureNames: Seq[String] =
    template ++ Seq("transaction_cum_sum", "debit_cum_sum", "credit_cum_sum")

  private def oneHot(name: String): Column = {
    val (src, value) = name.lastIndexOf('_') match {
      case i => (name.substring(0, i), name.substring(i + 1))
    }
    when(col(src).cast("string") === value, 1.0).otherwise(0.0).as(name)
  }

  /** sklearn StandardScaler with ddof=0; σ=0 divides by 1.
    *
    * DELIBERATELY not [[graft.ops.Sequences.zScorePop]]: that helper
    * replicates run.py's manual numpy z-score, which this engine pins to
    * literal 0.0 on zero-variance groups, while sklearn's transform is
    * `(x − mean_) / 1.0` — it does NOT snap to zero, so a zero-variance
    * group whose mean is not exactly representable yields the same ±ulp
    * residue sklearn itself produces. The VRAE encoder was trained on
    * sklearn-scaled inputs (vrae/vrae.py), so this path keeps sklearn's
    * edge semantics; the q36/q83 oracle rows keep numpy's. */
  private def scalePop(c: Column, user: Seq[String]): Column = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(user.map(col): _*)
    val sd = stddev_pop(c).over(w)
    (c - avg(c).over(w)) / when(sd === 0 || sd.isNull, 1.0).otherwise(sd)
  }

  /** (user_id, seq: array<array<double>>) — one variable-length, ordered,
    * 394-dim dense sequence per user, ready for [[LatentEncoderModel]]. */
  def assemble(tx: DataFrame): DataFrame = {
    val ord: Seq[Column] =
      Seq(col("transaction_dttm"), col("mcc_code"), col("transaction_amt"))
    // na.drop() vs the reference: run.py:108's fillna(0) is STRUCTURAL —
    // it zero-fills the NaNs its own prep just created (debit/credit
    // masks at run.py:97-98, reindex at run.py:106) — it never repairs
    // null INPUT cells. A null transaction_dttm crashes the reference
    // outright (`.apply(lambda x: x.hour…)` on NaT, run.py:95); a null
    // transaction_amt would flow through fillna as a fake 0.0 and distort
    // the per-user StandardScaler fit (run.py:113). Neither is a
    // semantics worth reproducing: the engine's contract is that a
    // transactions row missing any of the three key columns is invalid
    // input and is dropped — the structural zero-fills below (otherwise
    // branches, one-hot reindex) reproduce run.py:108 exactly where it
    // actually does something. Committed fixtures + the q36/q83 oracles
    // pin this policy.
    val withAttrs = tx.na.drop()
      .withColumn("hour_of_day", hour(col("transaction_dttm")))
      .withColumn("day_of_week",
        TimeFeatures.dayOfWeekMon0(col("transaction_dttm")))
      .withColumn("day_of_month", dayofmonth(col("transaction_dttm")))
      .withColumn("month", month(col("transaction_dttm")))
      .withColumn("time_day",
        TimeFeatures.secondsSinceMidnight(col("transaction_dttm"))
          .cast("double"))
      .withColumn("debit", when(col("transaction_amt") > 0,
        col("transaction_amt")).otherwise(0.0))
      .withColumn("credit", when(col("transaction_amt") < 0,
        col("transaction_amt")).otherwise(0.0))
    val withRef = withAttrs.crossJoin(broadcast(
      withAttrs.agg(min(unix_micros(col("transaction_dttm"))).as("_t0"))))
    val withTd = withRef.withColumn("timediff",
      TimeFeatures.hoursSince(col("transaction_dttm"), col("_t0"))
        .cast("double"))
    val user = Seq("user_id")
    val scaled = withTd
      .withColumn("amt_s", scalePop(col("transaction_amt"), user))
      .withColumn("debit_s", scalePop(col("debit"), user))
      .withColumn("credit_s", scalePop(col("credit"), user))
    val cum = scaled
      .withColumn("transaction_cum_sum",
        Sequences.cumSum(col("amt_s"), user, ord))
      .withColumn("debit_cum_sum", Sequences.cumSum(col("debit_s"), user, ord))
      .withColumn("credit_cum_sum",
        Sequences.cumSum(col("credit_s"), user, ord))
      .withColumn("timediff_rb",
        Sequences.rebaseToFirst(col("timediff"), user, ord))
    val featCols: Seq[Column] = featureNames.map {
      case "transaction_amt" => col("amt_s").as("transaction_amt")
      case "timediff" => col("timediff_rb").as("timediff")
      case "time_day" => col("time_day")
      case "debit" => col("debit_s").as("debit")
      case "credit" => col("credit_s").as("credit")
      case cum3 @ ("transaction_cum_sum" | "debit_cum_sum" |
                   "credit_cum_sum") => col(cum3)
      case dummy => oneHot(dummy)
    }
    val feats = cum.select(
      (Seq(col("user_id")) ++ ord.zipWithIndex.map { case (c, i) =>
        c.as(s"_ord$i")
      } ++ featCols): _*)
    // variable-length per-user sequences: the reference feeds ALL of a
    // user's rows to the encoder (run.py:111-123), no trim/pad
    feats
      .select(col("user_id"),
        struct((0 until ord.length).map(i => col(s"_ord$i")): _*).as("_o"),
        array(featureNames.map(col): _*).as("_f"))
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("_o"), col("_f"))).as("_rows"))
      .withColumn("seq",
        transform(array_sort(col("_rows")), r => r.getField("_f")))
      .select(col("user_id"), col("seq"))
  }
}
