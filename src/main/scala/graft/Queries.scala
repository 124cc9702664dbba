package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.CrossRound.round // shadows functions.round: cross-engine form
import graft.ops._
import graft.pipeline.{LinearScorer, Pipeline, TreeEnsembleModel,
  TreeEnsembleScorer}
import graft.schema.Tables

/**
 * Driver-contract query registry, part 1: the reference's relational operator
 * inventory (SURVEY.md §2) expressed over the driver testdata.
 *
 * Mapping convention (FIXTURES.md §2): events.user_id ↔ transactions.user_id,
 * event_type ↔ mcc_code (categorical key), value ↔ transaction_amt, ts ↔
 * transaction_dttm. The testdata's `value` is all-positive, so a deterministic
 * signed view (`sval`: error/view rows negated) stands in for the reference's
 * signed amounts — both engines derive it identically.
 *
 * Float-determinism policy for the DuckDB-hash oracle: integer outputs stay
 * integer (cast to BIGINT on both sides); money-scale sums round to 2 dp
 * (accumulation-order noise << 5e-3); small per-group stats round to 6 dp;
 * ratios guard their denominator on a 2-dp grid before dividing so a
 * float-noise "zero" can never explode.
 */
object Queries {
  type QFn = (SparkSession, String) => DataFrame

  private val vocab = Tables.eventTypeVocab // click, error, purchase, signup, view

  /** Signed amount view (deterministic in both engines). */
  private def sval: Column =
    when(col("event_type").isin("error", "view"), -col("value"))
      .otherwise(col("value"))
  private val svalSql =
    "CASE WHEN event_type IN ('error','view') THEN -value ELSE value END"

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)
  private val ord: Seq[Column] = Seq(col("ts"), col("event_id"))

  /** Money-sum policy: TPC-H prices/discounts/taxes are 2-dp decimals
    * stored as doubles. Casting each operand back to DECIMAL recovers the
    * intended decimal exactly (the doubles sit ~1e-14 from the true value),
    * and decimal sums are EXACT and order-independent — so Spark's partial
    * aggregation and DuckDB's sequential sum produce bit-identical results
    * regardless of group size, where a double sum at 1e8 magnitude can
    * straddle a round(2) boundary. Final cast back to double (4-dp sums at
    * 1e12 still fit a double exactly). */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def rate(c: Column): Column = c.cast("decimal(3,2)")
  private def moneySum(c: Column): Column = sum(c).cast("double")
  private val oneD = lit(1).cast("decimal(3,2)")

  // ---------------------------------------------------------------- P4/P5
  private val q01: (String, QFn, Option[String]) = ("q01_time_attrs",
    (s, d) => ev(s, d).select(
      col("event_id"), col("user_id"),
      hour(col("ts")).cast("long").as("hour_of_day"),
      TimeFeatures.dayOfWeekMon0(col("ts")).cast("long").as("day_of_week"),
      dayofmonth(col("ts")).cast("long").as("day_of_month"),
      month(col("ts")).cast("long").as("month"),
      TimeFeatures.secondsSinceMidnight(col("ts")).cast("long").as("time_day")),
    Some("""SELECT event_id, user_id, hour(ts) AS hour_of_day,
      | isodow(ts) - 1 AS day_of_week, day(ts) AS day_of_month,
      | month(ts) AS month,
      | hour(ts)*3600 + minute(ts)*60 + second(ts) AS time_day
      |FROM events""".stripMargin))

  // ------------------------------------------------------------------ P7/P9
  private val q02: (String, QFn, Option[String]) = ("q02_signed_split",
    (s, d) => {
      val sv = sval
      ev(s, d).select(col("event_id"), sv.as("sval"),
        coalesce(DebitCredit.debit(sv), lit(0.0)).as("debit"),
        coalesce(DebitCredit.credit(sv), lit(0.0)).as("credit"))
    },
    Some(s"""SELECT event_id, $svalSql AS sval,
      | CASE WHEN $svalSql > 0 THEN $svalSql ELSE 0 END AS debit,
      | CASE WHEN $svalSql < 0 THEN $svalSql ELSE 0 END AS credit
      |FROM events""".stripMargin))

  // ------------------------------------------------------------------ P2/P3
  private val q03: (String, QFn, Option[String]) = ("q03_filter",
    (s, d) => ev(s, d)
      .filter(col("value").isNotNull && col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value")),
    Some("""SELECT event_id, user_id, event_type, value FROM events
      |WHERE value IS NOT NULL AND event_type <> 'error'""".stripMargin))

  // -------------------------------------------------------------- A1 + P8
  private def freqCols: Seq[String] = vocab.map(v => s"freq_$v")
  private def pivotCountSql(valueExpr: String = "count(value)",
                            prefix: String = "freq"): String =
    vocab.map(v =>
      s"$valueExpr FILTER (WHERE event_type = '$v') AS ${prefix}_$v")
      .mkString(", ")

  private val q04: (String, QFn, Option[String]) = ("q04_pivot_count",
    (s, d) => Pivots.pivotCount(ev(s, d), "user_id", "event_type", vocab,
      "value", "freq"),
    Some(s"SELECT user_id, ${pivotCountSql()} FROM events GROUP BY user_id"))

  // -------------------------------------------------------------- A2/A3
  private val q05: (String, QFn, Option[String]) = ("q05_pivot_sums",
    (s, d) => {
      val e = ev(s, d).withColumn("sv", sval)
        .withColumn("deb", DebitCredit.debit(col("sv")))
        .withColumn("cred", DebitCredit.credit(col("sv")))
      // all three families in ONE conditional-aggregation pass — a single
      // shuffle on user_id (see Pivots scaladoc)
      val aggs = for (f <- Seq("proc" -> "sv", "deb" -> "deb",
        "cred" -> "cred"); v <- vocab) yield
        sum(when(col("event_type") === v, col(f._2))).as(s"${f._1}_$v")
      val p = e.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      val outCols = for (f <- Seq("proc", "deb", "cred"); v <- vocab)
        yield round(coalesce(col(s"${f}_$v"), lit(0.0)), 6).as(s"${f}_$v")
      p.select(col("user_id") +: outCols: _*)
    },
    Some {
      val frags = for (f <- Seq("proc", "deb", "cred"); v <- vocab) yield {
        val base = f match {
          case "proc" => svalSql
          case "deb" => s"CASE WHEN $svalSql > 0 THEN $svalSql END"
          case "cred" => s"CASE WHEN $svalSql < 0 THEN $svalSql END"
        }
        s"round(COALESCE(sum($base) FILTER (WHERE event_type = '$v'), 0), 6) AS ${f}_$v"
      }
      s"SELECT user_id, ${frags.mkString(", ")} FROM events GROUP BY user_id"
    })

  // ------------------------------------------------------------------ A4
  private val q06: (String, QFn, Option[String]) = ("q06_pivot_dow",
    (s, d) => Pivots.pivotCount(
      ev(s, d).withColumn("dow", TimeFeatures.dayOfWeekMon0(col("ts"))),
      "user_id", "dow", (0 to 6), "value", "dow"),
    Some(s"""SELECT user_id, ${(0 to 6).map(i =>
        s"count(value) FILTER (WHERE isodow(ts) - 1 = $i) AS dow_$i")
        .mkString(", ")}
      |FROM events GROUP BY user_id""".stripMargin))

  // ------------------------------------------------------------------ P10
  private val q07: (String, QFn, Option[String]) = ("q07_floor_div",
    (s, d) => Pivots.floorDiv(
      Pivots.pivotCount(ev(s, d), "user_id", "event_type", vocab, "value",
        "freq"), freqCols, 5),
    Some(s"""SELECT user_id, ${vocab.map(v =>
        s"count(value) FILTER (WHERE event_type = '$v') // 5 AS freq_$v")
        .mkString(", ")}
      |FROM events GROUP BY user_id""".stripMargin))

  // ---------------------------------------------------------- A9/A11/A12
  private val q08: (String, QFn, Option[String]) = ("q08_row_norm",
    (s, d) => {
      val pv = Pivots.pivotCount(ev(s, d), "user_id", "event_type", vocab,
        "value", "freq")
      val normed = RowNorm.rowNormalize(pv, freqCols, "freq_sum")
      val rounded = normed.select(
        col("user_id") +:
          freqCols.map(c => round(col(c), 6).as(c)) :+
          col("freq_sum").cast("long").as("freq_sum"): _*)
      val e = ev(s, d).withColumn("sv", sval)
      val shares = e.groupBy(col("user_id")).agg(
        coalesce(sum(DebitCredit.debit(col("sv"))), lit(0.0)).as("ds"),
        coalesce(sum(DebitCredit.credit(col("sv"))), lit(0.0)).as("cs"))
      val den = round(col("ds") + col("cs"), 2)
      val sharesOut = shares.select(col("user_id"),
        when(den === 0, lit(0.0)).otherwise(round(col("ds") / den, 6))
          .as("deb_share"),
        when(den === 0, lit(0.0)).otherwise(round(col("cs") / den, 6))
          .as("cred_share"))
      rounded.join(sharesOut, Seq("user_id"))
    },
    Some {
      val norms = vocab.map(v =>
        s"round((count(value) FILTER (WHERE event_type = '$v')) / count(value), 6) AS freq_$v")
      val ds = s"COALESCE(sum(CASE WHEN $svalSql > 0 THEN $svalSql END), 0)"
      val cs = s"COALESCE(sum(CASE WHEN $svalSql < 0 THEN $svalSql END), 0)"
      val den = s"round($ds + $cs, 2)"
      s"""SELECT user_id, ${norms.mkString(", ")},
        | count(value) AS freq_sum,
        | CASE WHEN $den = 0 THEN 0 ELSE round($ds / $den, 6) END AS deb_share,
        | CASE WHEN $den = 0 THEN 0 ELSE round($cs / $den, 6) END AS cred_share
        |FROM events GROUP BY user_id""".stripMargin
    })

  // ------------------------------------------------------------------ A5
  // exactMoments: std/sem/var from exact power sums — order-independent,
  // so the rational-valued td_var (round 2) can't straddle a boundary
  // against the sequential oracle at any SF.
  private val q09: (String, QFn, Option[String]) = ("q09_group_stats",
    (s, d) => {
      val e = ev(s, d).withColumn("time_day",
        TimeFeatures.secondsSinceMidnight(col("ts")))
      GroupStats.stats(e, Seq("user_id"), "time_day", "td",
        exactMoments = true).select(
        col("user_id"), col("td_count"),
        round(col("td_mean"), 6).as("td_mean"),
        round(col("td_std"), 6).as("td_std"),
        col("td_min").cast("long").as("td_min"),
        col("td_max").cast("long").as("td_max"),
        round(col("td_median"), 6).as("td_median"),
        round(col("td_sem"), 6).as("td_sem"),
        round(col("td_skew"), 6).as("td_skew"),
        round(col("td_var"), 2).as("td_var"),
        col("td_sum").cast("long").as("td_sum"),
        col("td_amplitude").cast("long").as("td_amplitude"))
    },
    Some("""WITH t AS (SELECT user_id,
      |  hour(ts)*3600 + minute(ts)*60 + second(ts) AS td FROM events),
      |p AS (SELECT user_id, count(td) AS n, sum(td)::DOUBLE AS sx,
      |  sum(td*td)::DOUBLE AS sxx, min(td) AS mn, max(td) AS mx,
      |  median(td) AS med, skewness(td) AS sk, sum(td)::BIGINT AS s
      |  FROM t GROUP BY user_id),
      |m AS (SELECT *, CASE WHEN n >= 2 THEN
      |    greatest((sxx - sx * sx / n::DOUBLE) / (n::DOUBLE - 1), 0) END AS vr
      |  FROM p)
      |SELECT user_id, n AS td_count, round(sx / n::DOUBLE, 6) AS td_mean,
      | round(sqrt(vr), 6) AS td_std, mn AS td_min,
      | mx AS td_max, round(med, 6) AS td_median,
      | round(sqrt(vr) / sqrt(n::DOUBLE), 6) AS td_sem,
      | round(sk, 6) AS td_skew, round(vr, 2) AS td_var,
      | s AS td_sum, (mx - mn)::BIGINT AS td_amplitude
      |FROM m""".stripMargin))

  // ------------------------------------------------------------------ W1
  private val q10: (String, QFn, Option[String]) = ("q10_trim",
    (s, d) => Trim.headTail(ev(s, d), 20, Seq("user_id"), ord)
      .select(col("event_id"), col("user_id")),
    Some("""WITH r AS (SELECT event_id, user_id,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |  count(*) OVER (PARTITION BY user_id) AS cnt FROM events)
      |SELECT event_id, user_id FROM r WHERE rn > 20 AND rn <= cnt - 20"""
      .stripMargin))

  // ------------------------------------------------------- J3/J4/U1/A14/O1
  // Trim depth 25 so the sf0.01 minimum-activity users (49 rows) vanish and
  // re-enter through the max-score fallback — both branches exercised.
  private val q11: (String, QFn, Option[String]) = ("q11_vanished_fallback",
    (s, d) => {
      val e = ev(s, d)
      val trimmed = Trim.headTail(e, 25, Seq("user_id"), ord)
      val scores = trimmed.groupBy(col("user_id"))
        .agg(round(avg(col("value")), 6).as("target"))
      val vanished = Trim.vanishedKeys(e, trimmed, Seq("user_id"))
      val fallback = vanished.crossJoin(
        broadcast(scores.agg(max(col("target")).as("target"))))
      scores.unionByName(fallback)
    },
    Some("""WITH r AS (SELECT user_id, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |  count(*) OVER (PARTITION BY user_id) AS cnt FROM events),
      |s AS (SELECT user_id, round(avg(value), 6) AS target FROM r
      |      WHERE rn > 25 AND rn <= cnt - 25 GROUP BY user_id),
      |v AS (SELECT DISTINCT user_id FROM events
      |      EXCEPT SELECT user_id FROM s)
      |SELECT user_id, target FROM s
      |UNION ALL SELECT user_id, (SELECT max(target) FROM s) FROM v"""
      .stripMargin))

  // ------------------------------------------------- A6/A7/A8 + W6/W7
  /** Shared repair CTE chain: exact np.percentile interpolation over the
    * sorted group array — identical expression tree to
    * Repair.interpPercentile. Final CTE `rep` = repaired rows, unrounded. */
  private def repairCtesSql: String = {
    def interp(q: String) =
      s"""arr[CAST(floor(($q)*(cnt-1)) AS INT)+1]
         | + (($q)*(cnt-1) - floor(($q)*(cnt-1)))
         |   * (arr[CAST(ceil(($q)*(cnt-1)) AS INT)+1]
         |      - arr[CAST(floor(($q)*(cnt-1)) AS INT)+1])"""
        .stripMargin.replaceAll("\n", "")
    s"""sv AS (SELECT event_id, user_id, ts, event_type AS code,
      |  $svalSql AS amt FROM events),
      |g AS (SELECT user_id, code, count(*) AS cnt,
      |      list_sort(list(amt)) AS arr FROM sv GROUP BY user_id, code),
      |g2 AS (SELECT user_id, code, cnt, arr,
      |       least(1.0, 10.0/cnt) AS p FROM g),
      |b AS (SELECT user_id, code, cnt,
      |      ${interp("p")} AS lo,
      |      ${interp("1.0 - p")} AS hi,
      |      ${interp("0.5")} AS med FROM g2),
      |b2 AS (SELECT b.*, max(cnt) OVER (PARTITION BY user_id) AS mx FROM b),
      |m1 AS (SELECT user_id, min(code) AS modal_code FROM b2
      |       WHERE cnt = mx GROUP BY user_id),
      |m2 AS (SELECT m1.user_id, m1.modal_code, b.med AS modal_med
      |       FROM m1 JOIN b ON b.user_id = m1.user_id
      |        AND b.code = m1.modal_code),
      |rep AS (SELECT sv.event_id, sv.user_id, sv.ts,
      | CASE WHEN b.cnt > 10 THEN sv.code ELSE m2.modal_code END AS code,
      | CASE WHEN b.cnt > 10 THEN
      |   (CASE WHEN sv.amt > b.hi OR sv.amt < b.lo THEN b.med
      |    ELSE sv.amt END) ELSE m2.modal_med END AS amt
      |FROM sv JOIN b ON sv.user_id = b.user_id AND sv.code = b.code
      | JOIN m2 ON sv.user_id = m2.user_id)""".stripMargin
  }

  private val q12: (String, QFn, Option[String]) = ("q12_repair",
    (s, d) => {
      val in = ev(s, d).select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), sval.as("amt"))
      Repair(in, "user_id", "event_type", "amt", nAmt = 10, nMcc = 10)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("amt"), 6).as("amt"))
    },
    Some(s"""WITH $repairCtesSql
      |SELECT event_id, user_id, code AS event_type,
      | round(amt, 6) AS amt FROM rep""".stripMargin))

  // ------------------------------------------------------------------ W2
  private val q13: (String, QFn, Option[String]) = ("q13_last_n",
    (s, d) => Sequences.lastN(ev(s, d), 5, Seq("user_id"), ord)
      .select(col("user_id"), col("pos").cast("long").as("pos"),
        col("event_id")),
    Some("""WITH r AS (SELECT user_id, event_id, row_number() OVER
      |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS pos
      |  FROM events)
      |SELECT user_id, pos, event_id FROM r WHERE pos <= 5""".stripMargin))

  // ------------------------------------------------------------ W3/W4/W5/P6
  private val q14: (String, QFn, Option[String]) = ("q14_seq_scalars",
    (s, d) => {
      val e = ev(s, d)
      val withRef = e.crossJoin(broadcast(
        e.agg(min(unix_micros(col("ts"))).as("_e0"))))
        .withColumn("sv", sval)
      val td = TimeFeatures.hoursSince(col("ts"), col("_e0"))
      withRef.select(col("event_id"),
        round(Sequences.cumSum(col("sv"), Seq("user_id"), ord), 6)
          .as("cum_amt"),
        round(Sequences.zScorePop(col("value"), Seq("user_id")), 6)
          .as("z_value"),
        Sequences.rebaseToFirst(td, Seq("user_id"), ord).cast("long")
          .as("td_rebased"))
    },
    Some(s"""WITH sv AS (SELECT event_id, user_id, ts, value,
      |  $svalSql AS amt FROM events),
      |r AS (SELECT min(epoch_us(ts)) AS e0 FROM events)
      |SELECT event_id,
      | round(sum(amt) OVER w, 6) AS cum_amt,
      | round(CASE WHEN stddev_pop(value) OVER p = 0
      |         OR stddev_pop(value) OVER p IS NULL THEN 0
      |       ELSE (value - avg(value) OVER p) / (stddev_pop(value) OVER p)
      |       END, 6) AS z_value,
      | (floor((epoch_us(ts) - e0) / 3600000000)
      |  - first_value(floor((epoch_us(ts) - e0) / 3600000000)) OVER w2)
      |  ::BIGINT AS td_rebased
      |FROM sv, r
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS UNBOUNDED PRECEDING),
      | p AS (PARTITION BY user_id),
      | w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin))

  // ------------------------------------------------------------------ E1
  private val q15: (String, QFn, Option[String]) = ("q15_one_hot",
    (s, d) => {
      val oh = OneHot.withOneHot(ev(s, d), "event_type", vocab, "et")
      oh.select(col("event_id") +:
        vocab.map(v => col(s"et_$v").cast("long").as(s"et_$v")): _*)
    },
    Some(s"""SELECT event_id, ${vocab.map(v =>
        s"(CASE WHEN event_type = '$v' THEN 1 ELSE 0 END)::BIGINT AS et_$v")
        .mkString(", ")} FROM events""".stripMargin))

  // ------------------------------------------------------------------ P11
  private val binEdges = Seq(0.0, 1.0, 5.0, 10.0, 50.0, 100.0, 250.0, 500.0)
  private val q16: (String, QFn, Option[String]) = ("q16_bucketize",
    (s, d) => ev(s, d).select(col("event_id"),
      Bucketize(col("value"), binEdges).cast("long").as("bin")),
    Some {
      val whens = binEdges.sliding(2).zipWithIndex.map {
        case (Seq(lo, hi), i) => s"WHEN value > $lo AND value <= $hi THEN $i"
        case _ => ""
      }.mkString(" ")
      s"SELECT event_id, (CASE $whens ELSE NULL END)::BIGINT AS bin FROM events"
    })

  // ------------------------------------------------------------------ E2
  // Tensor assembly, registered in SCALARIZED form: the padded
  // array<array<double>> tensor posexploded to (user_id, pos, f0, f1) rows —
  // SQL-expressible, so the driver hash-checks the full tensor content
  // (array-typed cells crash its pandas checker). pos is 1-based into the
  // length-5 left-padded sequence: pos 5 = newest event, pos <= 5-count(user)
  // = zero padding. The tensor form stays the library surface
  // (Sequences.assembleSequences, pinned by SequencesSpec).
  private val q17: (String, QFn, Option[String]) = ("q17_sequences",
    (s, d) => Sequences.assembleSequences(
        ev(s, d).withColumn("sv", sval), 5, Seq("user_id"),
        struct(col("ts"), col("event_id")), Seq("value", "sv"))
      .select(col("user_id"), posexplode(col("seq")))
      .select(col("user_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").getItem(0).as("f0"), col("col").getItem(1).as("f1")),
    Some(s"""WITH ranked AS (
      |  SELECT user_id, value, $svalSql AS sv,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rd
      |  FROM events),
      |kept AS (
      |  SELECT user_id, (6 - rd)::BIGINT AS pos,
      |    value::DOUBLE AS f0, sv::DOUBLE AS f1
      |  FROM ranked WHERE rd <= 5),
      |counts AS (SELECT user_id, least(count(*), 5) AS k
      |  FROM events GROUP BY user_id),
      |pads AS (SELECT user_id, unnest(range(1, 6 - k))::BIGINT AS pos,
      |    0.0 AS f0, 0.0 AS f1
      |  FROM counts)
      |SELECT * FROM kept UNION ALL SELECT * FROM pads""".stripMargin))

  // -------------------------------------------------------------- J2/P12
  private val q18: (String, QFn, Option[String]) = ("q18_feature_matrix",
    (s, d) => {
      val e = ev(s, d)
      val pv = Pivots.pivotCount(e, "user_id", "event_type", vocab, "value",
        "freq")
      val sums = {
        val p = Pivots.pivotSum(e.withColumn("sv", sval), "user_id",
          "event_type", vocab, "sv", "proc")
        p.select(col("user_id") +: vocab.map(v =>
          round(col(s"proc_$v"), 6).as(s"proc_$v")): _*)
      }
      val st = GroupStats.stats(
        e.withColumn("time_day", TimeFeatures.secondsSinceMidnight(col("ts"))),
        Seq("user_id"), "time_day", "td")
        .select(col("user_id"), round(col("td_mean"), 6).as("td_mean"),
          round(col("td_std"), 6).as("td_std"))
      val joined = pv.join(sums, Seq("user_id"), "outer")
        .join(st, Seq("user_id"), "outer")
        .na.fill(0.0)
      // P12: model-demanded column absent from the data → zero column
      joined.withColumn("nn_predict", lit(0.0))
    },
    Some(s"""SELECT user_id, ${pivotCountSql()},
      | ${vocab.map(v => s"round(COALESCE(sum($svalSql) FILTER (WHERE event_type = '$v'), 0), 6) AS proc_$v").mkString(", ")},
      | round(avg(hour(ts)*3600 + minute(ts)*60 + second(ts)), 6) AS td_mean,
      | round(stddev_samp(hour(ts)*3600 + minute(ts)*60 + second(ts)), 6)
      |   AS td_std,
      | 0.0 AS nn_predict
      |FROM events GROUP BY user_id""".stripMargin))

  // -------------------------------------------------------------- A13/U1
  // The mean is aggregated through DECIMAL(28,10): decimal addition is
  // exact integer arithmetic, so the sum is ORDER-INDEPENDENT — Spark's
  // partition-parallel partial aggregation and DuckDB's sequential scan
  // produce the identical sum at any scale, where a double sum's last-ulp
  // noise differs with summation order and can straddle a round boundary
  // (observed at sf0.1: a true mean sitting exactly on the 5e-7 grid).
  private val q19: (String, QFn, Option[String]) = ("q19_ensemble_mean",
    (s, d) => {
      val e = ev(s, d)
      val run0 = e.select(col("user_id"), col("value").as("v"))
      val run1 = e.select(col("user_id"), (col("value") * 0.5).as("v"))
      run0.unionByName(run1).groupBy(col("user_id"))
        .agg(round(sum(col("v").cast("decimal(28,10)")).cast("double")
          / count(col("v")), 6).as("target"))
    },
    Some("""SELECT user_id,
      | round(sum(CAST(v AS DECIMAL(28,10)))::DOUBLE / count(v), 6)
      |   AS target FROM (
      |  SELECT user_id, value AS v FROM events
      |  UNION ALL SELECT user_id, value * 0.5 AS v FROM events)
      |GROUP BY user_id""".stripMargin))

  // ------------------------------------------------------------------ E3
  // Bootstrap resampling, registered in DETERMINISTIC form: per-row
  // replication count = inverse Poisson(0.95) CDF of an md5-derived uniform
  // over (event_id, run) — the same per-row Poisson model Spark's seeded
  // sampler draws from, but data-derived, so DuckDB replays it bit-for-bit
  // (the e02/e04 literal-replay trick). The RNG-seeded form stays the
  // library surface (Sampling.bootstrapRuns). The oracle aggregates
  // replication counts as weights (sum(cnt*v)/sum(cnt)) — identical to
  // Spark's avg over the exploded rows at round-6 tolerance.
  private val q20: (String, QFn, Option[String]) = ("q20_bootstrap",
    (s, d) => Sampling.deterministicBootstrapRuns(
        ev(s, d), col("event_id"), 3, 0.95)
      .groupBy(col("run_id").cast("long").as("run_id"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("mean_value")),
    Some {
      val caseSql = Sampling.poissonThresholds(0.95, 8).zipWithIndex
        .map { case (t, i) => s"WHEN u < $t THEN $i" }.mkString(" ")
      s"""WITH tagged AS (
        |  SELECT e.event_id, e.value, r.run_id
        |  FROM events e CROSS JOIN
        |    (SELECT unnest(range(0, 3)) AS run_id) r),
        |uu AS (SELECT run_id, value,
        |  ('0x'||substr(md5(event_id::VARCHAR||'#'||run_id::VARCHAR),1,15))::BIGINT
        |    / 1152921504606846976.0 AS u FROM tagged),
        |c AS (SELECT run_id, value, (CASE $caseSql ELSE 8 END) AS cnt FROM uu)
        |SELECT run_id::BIGINT AS run_id, sum(cnt)::BIGINT AS n,
        |  round(sum(CASE WHEN value IS NOT NULL THEN cnt * value END)
        |    / sum(CASE WHEN value IS NOT NULL THEN cnt END), 6) AS mean_value
        |FROM c GROUP BY run_id""".stripMargin
    })

  // ------------------------------------------- TPC-H-style scan/join/agg
  private val q21: (String, QFn, Option[String]) = ("q21_pricing_summary",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(dec2(col("l_quantity"))).as("sum_qty"),
        moneySum(dec2(col("l_extendedprice"))).as("sum_base_price"),
        moneySum(dec2(col("l_extendedprice"))
          * (oneD - rate(col("l_discount")))).as("sum_disc_price"),
        moneySum(dec2(col("l_extendedprice"))
          * (oneD - rate(col("l_discount")))
          * (oneD + rate(col("l_tax")))).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order")),
    Some("""SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |   AS sum_base_price,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
      |   AS DOUBLE) AS sum_disc_price,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
      |   * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))
      |   AS DOUBLE) AS sum_charge,
      | round(avg(l_quantity), 6) AS avg_qty,
      | round(avg(l_extendedprice), 6) AS avg_price,
      | round(avg(l_discount), 6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin))

  // small dims explicitly broadcast: map-side join, zero shuffle of customer
  private val q22: (String, QFn, Option[String]) = ("q22_join_broadcast",
    (s, d) => Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("num_customers"),
        moneySum(dec2(col("c_acctbal"))).as("total_acctbal")),
    Some("""SELECT r_name, count(*) AS num_customers,
      | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |   AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin))

  // big-big shuffle join (AQE picks the strategy) + distinct aggregate
  private val q23: (String, QFn, Option[String]) = ("q23_join_bigbig",
    (s, d) => Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        moneySum(dec2(col("l_extendedprice"))
          * (oneD - rate(col("l_discount")))).as("revenue")),
    Some("""SELECT o_orderpriority, count(*) AS n_items,
      | count(DISTINCT o_orderkey) AS n_orders,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
      |   AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority""".stripMargin))

  // ------------------------------------------------------- O-family top-k
  private val q24: (String, QFn, Option[String]) = ("q24_window_topk",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk"),
          col("o_totalprice"))
    },
    Some("""WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
      |SELECT o_custkey, o_orderkey, rk, o_totalprice FROM r WHERE rk <= 3"""
      .stripMargin))

  // ---------------------------------------- event-time tumbling window
  // Batch analog of the Structured Streaming aggregation (SURVEY.md §2.10);
  // the same groupBy(window(...)) plan runs unchanged under readStream.
  private val q25: (String, QFn, Option[String]) = ("q25_hourly_window",
    (s, d) => ev(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n"), col("sum_value")),
    Some("""SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT
      |   AS hour_start,
      | event_type, count(*) AS n, round(sum(value), 6) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin))

  // ------------------------------------------------------------------ A10
  // Horizontal stats over the positive cells of the pivot-count row
  // (reference get_stats, run.py:207-234). The oracle mirrors the exact
  // expression tree of HorizontalStats.statCols — same fold order, same
  // guards — so round(6) absorbs only last-ulp libm noise.
  /** DuckDB replay of HorizontalStats over the FREQ (pivot-count) cells,
    * emitting `<prefix>_<stat>` columns — shared by q26 (intent mode,
    * prefix hs) and q26b (bugCompat mode: the stats carry another family's
    * prefix but still describe the freq cells, exactly the reference
    * closure bug). */
  private def horizontalStatsOracleSql(prefix: String): String = {
      val cells = vocab.map(v =>
        s"(count(value) FILTER (WHERE event_type = '$v'))::DOUBLE")
        .mkString(", ")
      val median = """CASE WHEN n > 0 THEN
        | CASE WHEN n % 2 = 1 THEN arr[CAST((n+1)/2 AS INT)]
        | ELSE (arr[CAST(n/2 AS INT)] + arr[CAST(n/2 AS INT)+1]) / 2 END
        |END""".stripMargin.replaceAll("\n", " ")
      val stats = Seq(
        "mean" -> "mean",
        "median" -> "med",
        "max" -> "mx", "min" -> "mn",
        "std" -> "sqrt(vr)",
        "sem" -> "sqrt(vr)/sqrt(n)",
        "skew" -> "sk",
        "var" -> "vr",
        "amplitude1" -> "mx - mn", "amplitude2" -> "mx - med",
        "amplitude3" -> "mx - mean", "amplitude4" -> "med - mn",
        "amplitude5" -> "mean - mn",
        "divmm1" -> "mx / mn", "divmm2" -> "mx / mean",
        "divmm3" -> "mx / med", "divmm4" -> "mean / mn",
        "divmm5" -> "med / mn")
        .map { case (nme, e) => s"round(COALESCE($e, 0), 6) AS ${prefix}_$nme" }
        .mkString(", ")
      s"""WITH p AS (SELECT user_id,
        |  list_sort(list_filter([$cells], x -> x > 0)) AS arr
        |  FROM events GROUP BY user_id),
        |s1 AS (SELECT user_id, arr, len(arr) AS n FROM p),
        |s2 AS (SELECT *, CASE WHEN n > 0 THEN
        |    list_aggregate(arr, 'sum') / n END AS mean,
        |  $median AS med,
        |  CASE WHEN n > 0 THEN arr[n] END AS mx,
        |  CASE WHEN n > 0 THEN arr[1] END AS mn FROM s1),
        |s3 AS (SELECT *,
        |  list_aggregate(list_transform(arr, x -> pow(x - mean, 2)), 'sum')
        |    AS m2,
        |  list_aggregate(list_transform(arr, x -> pow(x - mean, 3)), 'sum')
        |    AS m3 FROM s2),
        |s4 AS (SELECT *, CASE WHEN n >= 2 THEN m2 / (n - 1) END AS vr,
        |  CASE WHEN n >= 3 AND m2 > 0 THEN
        |    n * sqrt(n - 1) * m3 / ((n - 2) * pow(m2, 1.5)) END AS sk
        |  FROM s3)
        |SELECT user_id, $stats FROM s4""".stripMargin
  }

  private val q26: (String, QFn, Option[String]) = ("q26_horizontal_stats",
    (s, d) => {
      val pv = Pivots.pivotCount(ev(s, d), "user_id", "event_type", vocab,
        "value", "freq")
      val st = HorizontalStats.withStats(pv, freqCols, "hs")
      st.select(col("user_id") +: HorizontalStats.statNames.map(x =>
        round(col(s"hs_$x"), 6).as(s"hs_$x")): _*)
    },
    Some(horizontalStatsOracleSql("hs")))

  // -------------------------------------------------- A10, bugCompat mode
  // The reference closure bug made observable (run.py:207-234): the stats
  // claim to describe the proc (pivot-sum) family — prefix ps — but
  // bugCompat feeds the closed-over mcc_freq columns, so every ps_* value
  // equals the freq-cell statistic, NOT a proc statistic. The oracle is the
  // freq-cell stats under the ps prefix: a hash match proves the bug is
  // reproduced bit-for-bit; intent mode (q26) stays the default.
  private val q26b: (String, QFn, Option[String]) = ("q26b_stats_bugcompat",
    (s, d) => {
      val e = ev(s, d).withColumn("sv", sval)
      val aggs =
        vocab.map(v =>
          count(when(col("event_type") === v, col("value"))).as(s"freq_$v")) ++
        vocab.map(v =>
          coalesce(sum(when(col("event_type") === v, col("sv"))), lit(0.0))
            .as(s"proc_$v"))
      val pv = e.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      val st = HorizontalStats.withStats(pv, vocab.map(v => s"proc_$v"), "ps",
        bugCompat = true, closureCols = freqCols)
      st.select(col("user_id") +: HorizontalStats.statNames.map(x =>
        round(col(s"ps_$x"), 6).as(s"ps_$x")): _*)
    },
    Some(horizontalStatsOracleSql("ps")))

  // --------------------------------------- §3.1 full pipeline, end to end
  // repair → trim(20) → drop 'error' (the MCC-6012 analog) → feature
  // matrix → linear scorer → max-score fallback for dropped users → sort.
  // The oracle composes the already-verified repair CTEs with the trim /
  // pivot / stats / scoring SQL — the whole run.py dataflow in one query.
  private val pipelineWeights = Map(
    "freq_click" -> 0.1, "freq_purchase" -> 0.2,
    "proc_signup" -> 0.001, "proc_view" -> 0.001,
    "td_mean" -> 0.0001, "td_std" -> 0.0001)

  /** Spark side of the §3.1 pipeline spine (clean → fused matrix), shared
    * by q27 (linear scorer) and q39 (tree scorer through the same spine). */
  private def pipelineFeatureMatrix(s: SparkSession, d: String)
  : (DataFrame, DataFrame) = {
    val e = ev(s, d)
    val in = e.select(col("event_id"), col("user_id"), col("ts"),
      col("event_type"), sval.as("amt"))
    val cleaned = Pipeline.clean(in, "user_id", "event_type", "amt", ord,
      Pipeline.Config(nAmt = 10, nMcc = 10, trimN = 20,
        dropCodes = Seq("error"))).cache()
    (Pipeline.featureMatrixFused(cleaned, "user_id", "event_type",
      "amt", TimeFeatures.secondsSinceMidnight(col("ts")), vocab), e)
  }

  /** Oracle CTE stack for the pipeline spine: repair → trim(20) →
    * drop 'error' → per-user features; `scoredSql` plugs the scorer. */
  private def pipelineOracleSql(scoredSql: String): String =
    s"""WITH $repairCtesSql,
      |trm AS (SELECT * FROM (SELECT rep.*,
      |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |     AS rn,
      |   count(*) OVER (PARTITION BY user_id) AS cnt FROM rep)
      |  WHERE rn > 20 AND rn <= cnt - 20),
      |kept AS (SELECT * FROM trm WHERE code <> 'error'),
      |feat AS (SELECT user_id,
      |  ${vocab.map(v => s"count(amt) FILTER (WHERE code = '$v') AS freq_$v").mkString(", ")},
      |  ${vocab.map(v => s"COALESCE(sum(amt) FILTER (WHERE code = '$v'), 0) AS proc_$v").mkString(", ")},
      |  avg(hour(ts)*3600 + minute(ts)*60 + second(ts)) AS td_mean,
      |  COALESCE(stddev_samp(hour(ts)*3600 + minute(ts)*60 + second(ts)),
      |    0) AS td_std
      |  FROM kept GROUP BY user_id),
      |scored AS (SELECT user_id, round($scoredSql, 6) AS target FROM feat),
      |v AS (SELECT DISTINCT user_id FROM events
      |      EXCEPT SELECT user_id FROM scored)
      |SELECT user_id, target FROM scored
      |UNION ALL SELECT user_id, (SELECT max(target) FROM scored) FROM v"""
      .stripMargin

  private val q27: (String, QFn, Option[String]) = ("q27_pipeline_submission",
    (s, d) => {
      val (fm, e) = pipelineFeatureMatrix(s, d)
      Pipeline.submission(fm, LinearScorer(pipelineWeights), e, "user_id")
    },
    Some {
      // LinearScorer folds bias + terms in column-name order
      val combo = pipelineWeights.toSeq.sortBy(_._1)
        .map { case (c, w) => s"$w * $c" }.mkString("0.0 + ", " + ", "")
      pipelineOracleSql(combo)
    })

  // --------------------------------------------- parity-plus: ROLLUP
  // Multi-level aggregation (SURVEY.md §2.4 notes cube/rollup come free
  // with the engine); NULL grouping cells normalized to a sentinel so the
  // hash compare is null-free.
  private val q28: (String, QFn, Option[String]) = ("q28_rollup",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        moneySum(dec2(col("l_quantity"))).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("n"), col("sum_qty")),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
      | COALESCE(l_linestatus, 'ALL') AS lstatus,
      | count(*) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""
      .stripMargin))

  // ----------------------------------------- sessionization (gap-based)
  // Training-pipeline staple over the event stream: lag → gap predicate →
  // running sum = session id → per-session aggregates. One shuffle on
  // user_id, shared by both the window and the final groupBy.
  private val q29: (String, QFn, Option[String]) = ("q29_sessionize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      val us = unix_micros(col("ts"))
      val gap = us - lag(us, 1).over(w)
      val isNew = when(gap.isNull || gap > lit(30L * 60 * 1000000L), 1L)
        .otherwise(0L)
      val sid = sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      ev(s, d).withColumn("_us", us).withColumn("session_id", sid)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("_us")).as("start_us"),
          (max(col("_us")) - min(col("_us"))).as("dur_us"),
          round(sum(col("value")), 6).as("sum_value"))
    },
    Some("""WITH o AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
      |  lag(epoch_us(ts)) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS pus FROM events),
      |f AS (SELECT *, CASE WHEN pus IS NULL OR us - pus > 1800000000
      |  THEN 1 ELSE 0 END AS nw FROM o),
      |s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id
      |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM f)
      |SELECT user_id, session_id::BIGINT AS session_id,
      | count(*) AS n_events, min(us) AS start_us,
      | max(us) - min(us) AS dur_us, round(sum(value), 6) AS sum_value
      |FROM s GROUP BY user_id, s.session_id""".stripMargin))

  // ------------------------------------------- five-way star-schema join
  private val q30: (String, QFn, Option[String]) = ("q30_star_join",
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long")
        .as("o_year"))
      .agg(count(lit(1)).as("n"),
        moneySum(dec2(col("l_extendedprice"))
          * (oneD - rate(col("l_discount")))).as("revenue")),
    Some("""SELECT r_name, year(o_orderdate) AS o_year, count(*) AS n,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
      |   AS DOUBLE) AS revenue
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, year(o_orderdate)""".stripMargin))

  // ------------------------------------------------ JSON column parsing
  // events.props carries a JSON payload; extract via path (get_json_object)
  // and via schema-full from_json — both stay codegen'd projections, and
  // the parsed attribute feeds a regular aggregate.
  private val q31: (String, QFn, Option[String]) = ("q31_json_extract",
    (s, d) => {
      val e = ev(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("k2",
          from_json(col("props"), lit("k LONG")).getField("k"))
      e.groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"),
          sum(col("k2")).as("sum_k"),
          round(avg(col("value")), 6).as("avg_value"))
    },
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
      |   AS k_mod,
      | count(*) AS n,
      | sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT
      |   AS sum_k,
      | round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1""".stripMargin))

  // ------------------------------------------------ parity-plus: CUBE
  private val q32: (String, QFn, Option[String]) = ("q32_cube",
    (s, d) => Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        moneySum(dec2(col("o_totalprice"))).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price")),
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      | COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |   AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"""
      .stripMargin))

  // ------------------------------------------- semi / anti joins (EXISTS)
  // Customers with at least one high-value order (left_semi = EXISTS) and
  // customers with none (left_anti = NOT EXISTS) — counted per market
  // segment so the oracle is a compact grouped result.
  private val q33: (String, QFn, Option[String]) = ("q33_semi_anti_join",
    (s, d) => {
      val bigOrders = Tables.orders(s, d)
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey"))
      val c = Tables.customer(s, d)
      val withBig = c.join(bigOrders, col("c_custkey") === col("o_custkey"),
        "left_semi").groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_with_big_order"))
      val withoutBig = c.join(bigOrders, col("c_custkey") === col("o_custkey"),
        "left_anti").groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_without_big_order"))
      withBig.join(withoutBig, Seq("c_mktsegment"), "outer")
        .na.fill(0, Seq("n_with_big_order", "n_without_big_order"))
    },
    Some("""SELECT c_mktsegment,
      | count(*) FILTER (WHERE EXISTS (SELECT 1 FROM orders
      |   WHERE o_custkey = c_custkey AND o_totalprice > 300000.0))
      |   AS n_with_big_order,
      | count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders
      |   WHERE o_custkey = c_custkey AND o_totalprice > 300000.0))
      |   AS n_without_big_order
      |FROM customer GROUP BY c_mktsegment""".stripMargin))

  // --------------------------------------------------------- as-of join
  // Each event gets the user's most recent prior (inclusive) signup value.
  // Spark side: AsOfJoin's union+carry-forward composition (one shuffle);
  // oracle: DuckDB's NATIVE ASOF LEFT JOIN — two independent formulations
  // of the semantics checking each other.
  private val q34: (String, QFn, Option[String]) = ("q34_asof_join",
    (s, d) => {
      val e = ev(s, d)
      val leftDf = e.select(col("event_id"), col("user_id"), col("ts"))
      val rightDf = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value").as("signup_value"))
      AsOfJoin(leftDf, rightDf, Seq("user_id"), "ts",
        tiebreak = col("event_id"))
        .select(col("event_id"), col("user_id"), col("signup_value"))
    },
    Some("""SELECT l.event_id, l.user_id, r.signup_value
      |FROM events l ASOF LEFT JOIN
      | (SELECT user_id, ts, value AS signup_value FROM events
      |  WHERE event_type = 'signup') r
      | ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin))

  // --------------------------------------------------------- range join
  // Clicks within ±5 minutes of each error event, per user: Spark side =
  // banded equi-join (RangeJoin, the quadratic-blowup-proof form); oracle =
  // DuckDB's native inequality join.
  private val q35: (String, QFn, Option[String]) = ("q35_range_join",
    (s, d) => {
      val e = ev(s, d).withColumn("us", unix_micros(col("ts")))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"),
          col("us").as("err_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("us").as("click_us"))
      RangeJoin(errors, clicks, Seq("user_id"), "err_us", "click_us",
        tol = 300000000L)
        .groupBy(col("user_id"), col("err_id"))
        .agg(count(lit(1)).as("n_clicks"),
          min(col("click_id")).as("first_click_id"))
    },
    Some("""SELECT l.user_id, l.event_id AS err_id,
      | count(*) AS n_clicks, min(r.event_id) AS first_click_id
      |FROM events l JOIN events r
      | ON l.user_id = r.user_id
      | AND l.event_type = 'error' AND r.event_type = 'click'
      | AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 300000000
      |GROUP BY l.user_id, l.event_id""".stripMargin))

  // --------------------------------- §3.1 VRAE branch, end to end
  // The reference's second feature branch (run.py:90-180): cleaned table →
  // one-hot of the (repaired) category → per-user z-score, cumulative sum,
  // rebased hour index. Composed over the shared repair CTEs like q27
  // composes the CatBoost branch — both §3.1 branches are now oracle-
  // checked end to end.
  private val q36: (String, QFn, Option[String]) = ("q36_vrae_branch",
    (s, d) => {
      val in = ev(s, d).select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), sval.as("amt"))
      val repaired = Repair(in, "user_id", "event_type", "amt",
        nAmt = 10, nMcc = 10)
      val oh = OneHot.withOneHot(repaired, "event_type", vocab, "et")
      val withRef = oh.crossJoin(broadcast(
        oh.agg(min(unix_micros(col("ts"))).as("_e0"))))
      val td = TimeFeatures.hoursSince(col("ts"), col("_e0"))
      withRef.select(
        col("event_id") +: col("user_id") +:
          vocab.map(v => col(s"et_$v").cast("long").as(s"et_$v")) ++: Seq(
          round(Sequences.cumSum(col("amt"), Seq("user_id"), ord), 6)
            .as("cum_amt"),
          round(Sequences.zScorePop(col("amt"), Seq("user_id")), 6)
            .as("z_amt"),
          Sequences.rebaseToFirst(td, Seq("user_id"), ord).cast("long")
            .as("td_rebased")): _*)
    },
    Some {
      val ohCols = vocab.map(v =>
        s"(CASE WHEN code = '$v' THEN 1 ELSE 0 END)::BIGINT AS et_$v")
        .mkString(", ")
      s"""WITH $repairCtesSql,
        |r2 AS (SELECT rep.*, epoch_us(ts) AS us FROM rep),
        |gref AS (SELECT min(us) AS e0 FROM r2)
        |SELECT event_id, user_id, $ohCols,
        | round(sum(amt) OVER w, 6) AS cum_amt,
        | round(CASE WHEN stddev_pop(amt) OVER p = 0
        |         OR stddev_pop(amt) OVER p IS NULL THEN 0
        |       ELSE (amt - avg(amt) OVER p) / (stddev_pop(amt) OVER p)
        |       END, 6) AS z_amt,
        | (floor((us - e0) / 3600000000)
        |  - first_value(floor((us - e0) / 3600000000)) OVER w2)
        |  ::BIGINT AS td_rebased
        |FROM r2, gref
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS UNBOUNDED PRECEDING),
        | p AS (PARTITION BY user_id),
        | w2 AS (PARTITION BY user_id ORDER BY ts, event_id)"""
        .stripMargin
    })

  // ------------------------------------------ S5/P12: real tree scorer
  // The committed GBT-style ensemble (CatBoost stand-in) scores the fused
  // per-user feature matrix after P12-aligning it to the model's 52-column
  // feature list (40 model-demanded ctx_* columns are absent from the data
  // and zero-fill). The oracle replays the trees as CASE chains generated
  // from the SAME artifact — leaf sums are literal doubles in a fixed
  // order, so the score is exact in both engines.
  private lazy val treeModel =
    TreeEnsembleModel.fromResource("/graft/tree_model.txt")
  private val q37: (String, QFn, Option[String]) = ("q37_tree_scorer",
    (s, d) => {
      val e = ev(s, d).withColumn("sv", sval)
      val fm = Pipeline.featureMatrixFused(e, "user_id", "event_type", "sv",
        TimeFeatures.secondsSinceMidnight(col("ts")), vocab)
      val aligned = Pipeline.alignFeatures(fm, "user_id",
        treeModel.featureNames)
      TreeEnsembleScorer(treeModel).score(aligned)
        .select(col("user_id"), col("target"))
    },
    Some {
      val featSql: String => String =
        f => if (f.startsWith("ctx_")) "0.0" else f
      s"""WITH fm AS (SELECT user_id,
        | ${vocab.map(v =>
              s"count(sv) FILTER (WHERE event_type = '$v') AS freq_$v")
             .mkString(", ")},
        | ${vocab.map(v =>
              s"COALESCE(sum(sv) FILTER (WHERE event_type = '$v'), 0.0) AS proc_$v")
             .mkString(", ")},
        | avg(td) AS td_mean,
        | CASE WHEN count(td) >= 2 THEN stddev_samp(td) ELSE 0.0 END AS td_std
        |FROM (SELECT user_id, event_type, $svalSql AS sv,
        |   hour(ts)*3600 + minute(ts)*60 + second(ts) AS td FROM events)
        |GROUP BY user_id)
        |SELECT user_id, round(${treeModel.toSql(featSql)}, 6) AS target
        |FROM fm""".stripMargin
    })

  // ------------------------------------- reference-width two-level pivot
  // 330-code vocabulary (event_type × value-bin, the MCC-vocab analog,
  // run.py:105) through Pivots.pivotWide — the shape that survives ~1,000
  // output columns where the single-pass conditional aggregation hits
  // Janino's 64 KB method limit (WidthStressSpec measures both). 660 output
  // columns, every cell hash-checked: reference width is driver-verified,
  // not just spec-asserted.
  private val wideVocab: Seq[String] =
    for (t <- vocab; b <- 0 until 66) yield s"${t}_$b"
  private val q38: (String, QFn, Option[String]) = ("q38_wide_pivot",
    (s, d) => {
      val e = ev(s, d).withColumn("sv", sval)
        .withColumn("code",
          concat_ws("_", col("event_type"),
            floor(col("value") / 7.5).cast("int")))
      val wide = Pivots.pivotWide(e, "user_id", "code", wideVocab, Seq(
        Pivots.Family("freq", count(col("value")).cast("double")),
        Pivots.Family("proc", sum(col("sv")))))
      wide.select(col("user_id") +:
        (wideVocab.map(c => col(s"freq_$c").cast("long").as(s"freq_$c")) ++
          wideVocab.map(c => round(col(s"proc_$c"), 6).as(s"proc_$c"))): _*)
    },
    Some {
      val freqs = wideVocab.map(c =>
        s"COALESCE(count(value) FILTER (WHERE code = '$c'), 0)::BIGINT AS freq_$c")
      val procs = wideVocab.map(c =>
        s"round(COALESCE(sum(sv) FILTER (WHERE code = '$c'), 0.0), 6) AS proc_$c")
      s"""SELECT user_id, ${(freqs ++ procs).mkString(", ")}
        |FROM (SELECT user_id, value, $svalSql AS sv,
        |  event_type || '_' || (floor(value / 7.5))::INT AS code FROM events)
        |GROUP BY user_id""".stripMargin
    })

  // -------------------------------- §3.1 pipeline × tree scorer (q27 twin)
  // The full run.py dataflow with the REAL scorer: clean → fused matrix →
  // P12 align to the model's 52 columns → tree-ensemble score → max-score
  // fallback for users the cleaning dropped → ordered submission. Same
  // oracle CTE stack as q27 with the tree CASE chains plugged in.
  private val q39: (String, QFn, Option[String]) = ("q39_tree_submission",
    (s, d) => {
      val (fm, e) = pipelineFeatureMatrix(s, d)
      val aligned = Pipeline.alignFeatures(fm, "user_id",
        treeModel.featureNames)
      Pipeline.submission(aligned, TreeEnsembleScorer(treeModel), e,
        "user_id")
    },
    Some(pipelineOracleSql(
      treeModel.toSql(f => if (f.startsWith("ctx_")) "0.0" else f))))

  // ------------------------------------------------- S1/S2 round-trip
  // CSV sink (reference submission format: header, second-precision
  // timestamps, run.py:85,486) → CSV scan with DECLARED schema — the two
  // IO operators composed and driver-checked: every surviving value must
  // hash-match the original table. Timestamps round-trip at the format's
  // second precision (mirrored with date_trunc in the oracle); doubles
  // round-trip exactly (shortest-repr text). The temp dir is keyed by the
  // input dir so per-SF runs don't collide.
  private val q40: (String, QFn, Option[String]) = ("q40_csv_roundtrip",
    (s, d) => {
      val e = ev(s, d).select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
      val dir = s"${sys.props("java.io.tmpdir")}/graft_csv_rt_" +
        d.replaceAll("[^a-zA-Z0-9]", "_")
      Tables.writeCsv(e, dir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType)))
      s.read.schema(schema).option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(dir)
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"),
          col("event_type"), col("value"))
    },
    Some("""SELECT event_id, user_id,
      | epoch_us(date_trunc('second', ts)) // 1000000 AS ts_sec,
      | event_type, value FROM events""".stripMargin))

  // --------------------------- deterministic stratified split + folds
  // Reproducible train/eval machinery: per-stratum subsample rates and a
  // 5-way fold assignment, both content-addressed (md5 of the row key) —
  // stable across runs, engines, partitionings and re-ingests, which is
  // what seeded-RNG splits silently are not. Oracle replays the identical
  // md5 arithmetic.
  private val splitRates = Map("click" -> 0.5, "error" -> 0.1,
    "purchase" -> 1.0, "signup" -> 1.0, "view" -> 0.25)
  private val q41: (String, QFn, Option[String]) = ("q41_stratified_split",
    (s, d) => Sampling.stratifiedKeep(ev(s, d), col("event_id"),
        col("event_type"), splitRates, salt = "strat")
      .select(col("event_id"), col("event_type"),
        Sampling.hashFold(col("event_id"), 5).as("fold")),
    Some {
      val rateCase = splitRates.toSeq.sortBy(_._1)
        .map { case (t, r) => s"WHEN event_type = '$t' THEN $r" }
        .mkString(" ")
      s"""SELECT event_id, event_type,
        | ('0x'||substr(md5(event_id::VARCHAR||'#fold'),1,15))::BIGINT % 5
        |   AS fold
        |FROM events
        |WHERE ('0x'||substr(md5(event_id::VARCHAR||'#strat'),1,15))::BIGINT
        |   / 1152921504606846976.0 < (CASE $rateCase ELSE 0.0 END)"""
        .stripMargin
    })

  // Keyed by pid as well as input dir: two concurrent JVMs at the same SF
  // (bench + correctness harness) must not overwrite/delete each other's
  // part files mid-read. Within one process, mode=overwrite is safe.
  // Every dir handed out is deleted by a JVM shutdown hook — pid-keying
  // means no other live process can be reading it, and without the hook
  // repeated bench/verify runs accumulate parquet-sized tmp garbage.
  private val rtDirs = scala.collection.mutable.Set[String]()
  private lazy val rtCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rtDirs.synchronized(rtDirs.toSeq).foreach(p => rm(new java.io.File(p)))
    }))
  /** Package-visible so QueriesText (e13's index dir) shares the same
    * pid-keyed, shutdown-hook-cleaned tmp-dir discipline. */
  private[graft] def rtDir(tag: String, d: String): String = {
    rtCleanupHook
    val p = s"${sys.props("java.io.tmpdir")}/graft_${tag}_" +
      s"p${ProcessHandle.current().pid()}_" +
      d.replaceAll("[^a-zA-Z0-9]", "_")
    rtDirs.synchronized { rtDirs += p }
    p
  }

  // ------------------------------------------------ JSONL source/sink
  // The interchange format training corpora ship in: documents → JSONL →
  // declared-schema scan; every value hash-checked against the source
  // (JSON string escaping makes the text round-trip lossless).
  private val q42: (String, QFn, Option[String]) = ("q42_jsonl_roundtrip",
    (s, d) => {
      val docsDf = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val dir = rtDir("jsonl_rt", d)
      Tables.writeJsonl(docsDf, dir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      Tables.readJsonl(s, dir, schema).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text").cast("binary")).as("digest"))
    },
    Some("""SELECT doc_id, length(text)::BIGINT AS n_chars,
      | md5(text) AS digest FROM documents""".stripMargin))

  // -------------------------------------------------- ORC source/sink
  // The second columnar format: lineitem → ORC → scan → aggregate;
  // doubles round-trip bit-exactly through ORC, so the decimal-exact
  // money sums must match the parquet-sourced oracle.
  private val q43: (String, QFn, Option[String]) = ("q43_orc_roundtrip",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      val dir = rtDir("orc_rt", d)
      Tables.writeOrc(li, dir)
      Tables.readOrc(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          moneySum(dec2(col("l_quantity"))).as("sum_qty"))
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin))

  // ------------------------------------- histogram-sketch quantiles
  // The bounded-state percentile path: 32 integer counters per event_type
  // instead of buffering whole groups (q12's exact collect_list sort) —
  // the percentile shape that survives 100 TB. Estimate = linear
  // interpolation inside the first bin whose cumulative count covers q·n.
  private val q44: (String, QFn, Option[String]) = ("q44_hist_quantile",
    (s, d) => Histogram.quantiles(Tables.events(s, d), col("event_type"),
        col("value"), 32, Seq(0.5, 0.9, 0.99))
      .select(col("grp").as("event_type"), col("q"), col("n"), col("est")),
    Some("""WITH s AS (SELECT min(value::DOUBLE) AS lo,
      |  max(value::DOUBLE) AS hi FROM events),
      |b AS (SELECT event_type,
      |  CASE WHEN hi = lo THEN 0
      |       ELSE least(31, floor((value::DOUBLE - lo)
      |                            / ((hi - lo) / 32))::INT) END AS bin
      |  FROM events, s),
      |c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
      |cc AS (SELECT event_type, bin, cnt,
      |  sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
      |    ROWS UNBOUNDED PRECEDING) AS cum,
      |  sum(cnt) OVER (PARTITION BY event_type) AS n FROM c),
      |qq AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q),
      |pick AS (SELECT event_type, q, n, floor(greatest(lo, least(hi,
      |    lo + (hi - lo) / 32 * (bin::DOUBLE
      |      + (q * n::DOUBLE - (cum - cnt)::DOUBLE) / cnt::DOUBLE))) * 1e6)
      |    / 1e6 AS est,
      |  row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rn
      |  FROM cc CROSS JOIN qq, s WHERE cum::DOUBLE >= q * n::DOUBLE)
      |SELECT event_type, q, n, est FROM pick WHERE rn = 1""".stripMargin))

  // ------------------------------------------- salted aggregation
  // The skew-resistant two-phase combine, driver-verified: the salted
  // path must produce EXACTLY the plain-aggregation answer (the oracle
  // aggregates flat). Hot keys split across 16 reducers in phase 1;
  // phase 2 merges 16 partials per key.
  private val q45: (String, QFn, Option[String]) = ("q45_salted_stats",
    (s, d) => Skew.saltedStats(Tables.events(s, d), "event_type", "value",
        saltOn = col("event_id"), salts = 16)
      .select(col("event_type"),
        round(col("value_sum"), 6).as("value_sum"),
        col("value_count"),
        col("value_min"), col("value_max"),
        round(col("value_avg"), 6).as("value_avg")),
    Some("""SELECT event_type, round(sum(value), 6) AS value_sum,
      | count(value) AS value_count,
      | min(value) AS value_min, max(value) AS value_max,
      | round(sum(value) / count(value), 6) AS value_avg
      |FROM events GROUP BY event_type""".stripMargin))

  // ------------------------------------------- bucketed co-located join
  // The shuffle-free persisted-join path: two per-user aggregates written
  // as parquet tables BUCKETED 8 ways on user_id, re-read and merge-joined
  // with ZERO exchanges (PlanShapeSpec asserts it). At 100 TB this is the
  // difference between re-shuffling the corpus on every downstream join and
  // paying the partitioning once at write time — the join keys only exact
  // (count / countDistinct / min / max), so the bucketed round-trip must
  // hash-match the flat oracle. External table paths are pid-keyed tmp dirs
  // (rtDir) so concurrent JVMs don't collide and the shutdown hook cleans up.
  private val q46: (String, QFn, Option[String]) = ("q46_bucketed_join",
    (s, d) => {
      val e = ev(s, d)
      val stats = e.groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      val types = e.groupBy(col("user_id")).agg(
        countDistinct(col("event_type")).as("n_types"))
      val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
      val (ta, tb) = (s"graft_q46a_$tag", s"graft_q46b_$tag")
      s.sql(s"DROP TABLE IF EXISTS $ta")
      s.sql(s"DROP TABLE IF EXISTS $tb")
      stats.write.mode("overwrite").option("path", rtDir("q46a", d))
        .bucketBy(8, "user_id").sortBy("user_id").saveAsTable(ta)
      types.write.mode("overwrite").option("path", rtDir("q46b", d))
        .bucketBy(8, "user_id").sortBy("user_id").saveAsTable(tb)
      s.table(ta).hint("merge").join(s.table(tb), Seq("user_id"))
    },
    Some("""WITH a AS (SELECT user_id, count(*)::BIGINT AS n_events,
      |  min(value) AS min_value, max(value) AS max_value
      |  FROM events GROUP BY 1),
      |b AS (SELECT user_id, count(DISTINCT event_type)::BIGINT AS n_types
      |  FROM events GROUP BY 1)
      |SELECT user_id, n_events, min_value, max_value, n_types
      |FROM a JOIN b USING (user_id)""".stripMargin))

  // --------------------------------------------------- salted skew join
  // The plan-level JOIN-skew answer, driver-verified: events (hot
  // event_type keys) join a per-type dimension through Skew.saltedJoin —
  // big side salted 16 ways, dim replicated 16×, shuffle-hash on
  // (key, salt) — and every enriched row must hash-match the flat join
  // oracle. Integer/min/max dim columns keep the compare exact.
  private val q47: (String, QFn, Option[String]) = ("q47_salted_join",
    (s, d) => {
      val e = ev(s, d)
      val dim = e.groupBy(col("event_type")).agg(
        count(lit(1)).as("type_n"),
        min(col("value")).as("type_min"),
        max(col("value")).as("type_max"))
      Skew.saltedJoin(e.select(col("event_id"), col("event_type"),
        col("value")), dim, "event_type", col("event_id"), 16)
        .select(col("event_id"), col("event_type"), col("value"),
          col("type_n"), col("type_min"), col("type_max"))
    },
    Some("""WITH dim AS (SELECT event_type, count(*)::BIGINT AS type_n,
      |  min(value) AS type_min, max(value) AS type_max
      |  FROM events GROUP BY 1)
      |SELECT event_id, event_type, value, type_n, type_min, type_max
      |FROM events JOIN dim USING (event_type)""".stripMargin))

  // --------------------------------------------- trailing range window
  // Velocity features: for EVERY event, count/sum/max of the same user's
  // events in the trailing hour — a RANGE frame on epoch seconds, not a
  // ROWS frame (RANGE is tie-stable: rows sharing a timestamp share a
  // frame, so results are deterministic under any within-tie order).
  // One shuffle on user_id, ordered scan, bounded frame state — the
  // per-entity trailing-window shape that survives 100 TB.
  private val q48: (String, QFn, Option[String]) = ("q48_range_window",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-3599, 0)
      ev(s, d).select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("sec"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", round(sum(col("value")).over(w), 6))
        .withColumn("max_1h", max(col("value")).over(w))
        .drop("value")
    },
    Some("""SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec,
      | count(*) OVER w AS n_1h,
      | round(sum(value) OVER w, 6) AS sum_1h,
      | max(value) OVER w AS max_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
      |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""".stripMargin))

  // --------------------------------------------- explicit grouping sets
  // The third multi-level aggregation form next to rollup (q28) and cube
  // (q32): an EXPLICIT set list — per-flag, per-status, and grand total,
  // but NOT the (flag, status) cross — the case rollup/cube can't express.
  // Spark 4's Dataset.groupingSets plans one expand + one shuffle.
  private val q49: (String, QFn, Option[String]) = ("q49_grouping_sets",
    (s, d) => Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        moneySum(dec2(col("l_quantity"))).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("n"), col("sum_qty")),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
      | COALESCE(l_linestatus, 'ALL') AS lstatus,
      | count(*) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
      .stripMargin))

  // ------------------------------------------------- relational set ops
  // INTERSECT / EXCEPT (distinct semantics) on user key sets between
  // event-type slices — the audience-overlap shape. Spark plans both as
  // hash joins on the key after local distinct; counted per op so the
  // oracle stays compact.
  private val q50: (String, QFn, Option[String]) = ("q50_set_ops",
    (s, d) => {
      val e = ev(s, d)
      def users(t: String) =
        e.filter(col("event_type") === t).select(col("user_id"))
      val both = users("click").intersect(users("view"))
      val pureBuyers = users("purchase").except(users("error"))
      both.agg(count(lit(1)).as("n")).select(lit("click_and_view").as("op"),
          col("n"))
        .unionByName(pureBuyers.agg(count(lit(1)).as("n"))
          .select(lit("purchase_no_error").as("op"), col("n")))
    },
    Some("""SELECT 'click_and_view' AS op, count(*) AS n FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'view')
      |UNION ALL
      |SELECT 'purchase_no_error' AS op, count(*) AS n FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'error')"""
      .stripMargin))

  // ------------------------------------------------ SQL-text API surface
  // The same ANSI SQL string runs through spark.sql over temp views AND
  // through the DuckDB oracle over the raw tables — the TPC-H Q3
  // (shipping-priority) shape: segment-filtered customer dim (broadcast
  // after pushdown prunes it) joined into the orders→lineitem chain,
  // decimal-exact revenue. Exercises the SQL entry point end to end;
  // every other query exercises the DataFrame DSL.
  private def q51Sql(c: String, o: String, l: String) =
    s"""SELECT l_orderkey, o_orderpriority,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
      |   AS DOUBLE) AS revenue,
      | count(*) AS n_items
      |FROM $c JOIN $o ON c_custkey = o_custkey
      | JOIN $l ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      | AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
      | AND l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
      |GROUP BY l_orderkey, o_orderpriority""".stripMargin
  private val q51: (String, QFn, Option[String]) =
    ("q51_sql_shipping_priority",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("v_customer")
        Tables.orders(s, d).createOrReplaceTempView("v_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
        s.sql(q51Sql("v_customer", "v_orders", "v_lineitem"))
      },
      Some(q51Sql("customer", "orders", "lineitem")))

  // ---------------------------------------------- null-semantics audit
  // The null contract, driver-verified: NULL group keys form ONE group,
  // count(*) counts rows while count(col)/avg skip nulls, and the
  // null-safe equality (<=> / IS NOT DISTINCT FROM) treats NULL = NULL as
  // true. Money averages go through the decimal-exact sum so the compare
  // is noise-free. Engines genuinely differ on these semantics (e.g.
  // NaN/null sort order), so pinning them against the oracle is cheap
  // insurance for every other query.
  private val q52: (String, QFn, Option[String]) = ("q52_null_semantics",
    (s, d) => {
      val o = Tables.orders(s, d).select(
        when(col("o_orderstatus") === "P", lit(null))
          .otherwise(col("o_orderstatus")).as("st"),
        when(col("o_totalprice") > 400000.0, lit(null))
          .otherwise(col("o_totalprice")).as("tp"))
      o.groupBy(col("st")).agg(
          count(lit(1)).as("n_rows"),
          count(col("tp")).as("n_nonnull"),
          sum(when(col("tp").isNull, 1L).otherwise(0L)).as("n_null"),
          round(moneySum(dec2(col("tp"))) / count(col("tp")), 6)
            .as("avg_tp"))
        .withColumn("is_null_group", (col("st") <=> lit(null)).cast("long"))
    },
    Some("""WITH o AS (SELECT
      |  CASE WHEN o_orderstatus = 'P' THEN NULL
      |    ELSE o_orderstatus END AS st,
      |  CASE WHEN o_totalprice > 400000.0 THEN NULL
      |    ELSE o_totalprice END AS tp FROM orders)
      |SELECT st, count(*) AS n_rows, count(tp) AS n_nonnull,
      | sum(CASE WHEN tp IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
      | round(CAST(sum(CAST(tp AS DECIMAL(18,2))) AS DOUBLE) / count(tp),
      |   6) AS avg_tp,
      | (st IS NOT DISTINCT FROM NULL)::BIGINT AS is_null_group
      |FROM o GROUP BY st""".stripMargin))

  // --------------------------------------------- schema-evolution read
  // The long-lived-dataset reality: generation v1 lacks a column that
  // generation v2 added. Written as two parquet dirs, read back in ONE
  // scan with mergeSchema — v1 rows surface NULL for the new column, and
  // the decimal-exact aggregates must hash-match an oracle computed from
  // the original table. Tmp dirs are pid-keyed (rtDir) with shutdown
  // cleanup.
  private val q53: (String, QFn, Option[String]) = ("q53_schema_evolution",
    (s, d) => {
      val base = ev(s, d).select(col("event_id"), col("user_id"),
        col("value"))
      val dir = rtDir("schevo", d)
      base.filter(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$dir/v1")
      base.filter(col("event_id") % 2 === 1)
        .withColumn("boost", col("value") * 2)
        .write.mode("overwrite").parquet(s"$dir/v2")
      s.read.option("mergeSchema", "true").parquet(s"$dir/v1", s"$dir/v2")
        .agg(count(lit(1)).as("n_rows"),
          count(col("boost")).as("n_with_boost"),
          moneySum(dec2(col("value"))).as("sum_value"),
          moneySum(dec2(col("boost"))).as("sum_boost"))
    },
    Some("""SELECT count(*) AS n_rows,
      | sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
      |   AS n_with_boost,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      | CAST(sum(CASE WHEN event_id % 2 = 1
      |   THEN CAST(value * 2 AS DECIMAL(18,2)) END) AS DOUBLE)
      |   AS sum_boost
      |FROM events""".stripMargin))

  // --------------------------------------------------- funnel analysis
  // First-touch ordered funnel signup → view → click → purchase: a user
  // reaches stage k when the FIRST occurrence of every stage up to k is
  // strictly later than the previous stage's first occurrence. ONE
  // corpus-sized shuffle (per-user conditional mins, map-side combined to
  // 4 timestamps per user); the stage counts are a 1-row aggregate
  // exploded to 4 stage rows, so conversion math never touches the
  // corpus. Counts are integer-exact; conversion ratios divide two longs
  // (round 6).
  private val q54: (String, QFn, Option[String]) = ("q54_funnel",
    (s, d) => EventAnalytics.funnel(ev(s, d), col("user_id"),
      col("event_type"), col("ts"),
      Seq("signup", "view", "click", "purchase")),
    Some("""WITH f AS (SELECT user_id,
      |  min(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
      |  min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
      |  min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
      |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
      |  FROM events GROUP BY user_id),
      |a AS (SELECT
      |  sum((t0 IS NOT NULL)::BIGINT) AS u0,
      |  sum((t0 IS NOT NULL AND t1 > t0)::BIGINT) AS u1,
      |  sum((t0 IS NOT NULL AND t1 > t0 AND t2 > t1)::BIGINT) AS u2,
      |  sum((t0 IS NOT NULL AND t1 > t0 AND t2 > t1 AND t3 > t2)::BIGINT)
      |    AS u3 FROM f)
      |SELECT 1::BIGINT AS stage_idx, 'signup' AS stage,
      |  u0::BIGINT AS users, CAST(NULL AS DOUBLE) AS conv_from_prev FROM a
      |UNION ALL SELECT 2::BIGINT, 'view', u1::BIGINT,
      |  CASE WHEN u0 > 0 THEN round(u1 / u0, 6) END FROM a
      |UNION ALL SELECT 3::BIGINT, 'click', u2::BIGINT,
      |  CASE WHEN u1 > 0 THEN round(u2 / u1, 6) END FROM a
      |UNION ALL SELECT 4::BIGINT, 'purchase', u3::BIGINT,
      |  CASE WHEN u2 > 0 THEN round(u3 / u2, 6) END FROM a""".stripMargin))

  // -------------------------------------------------- cohort retention
  // Weekly cohort retention: cohort = Monday (epoch seconds) of the
  // user's first active week; one output row per (cohort, week offset)
  // counts the users active that week. ONE corpus-sized shuffle: the
  // per-user groupBy collects the user's distinct week set (map-side
  // combined, bounded by weeks-in-history — a few hundred values even for
  // a decade of data); cohort = array_min of that set, and the exploded
  // (user, week) rows that feed the final (cohort, offset) agg are
  // users × weeks, not events. Offsets are exact integer arithmetic on
  // Monday-midnight epochs.
  private val q55: (String, QFn, Option[String]) = ("q55_cohort_retention",
    (s, d) => EventAnalytics.cohortRetention(ev(s, d), col("user_id"),
      col("ts")),
    Some("""WITH w AS (SELECT DISTINCT user_id,
      |  epoch(date_trunc('week', ts))::BIGINT AS wk FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort_week_s FROM w
      |  GROUP BY user_id)
      |SELECT c.cohort_week_s, (w.wk - c.cohort_week_s) // 604800
      |   AS week_offset, count(*) AS n_users
      |FROM w JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin))

  // ------------------------------------- time-decay (half-life) features
  // Recency-weighted user value: each event contributes
  // value × 2^(−age_weeks), age_weeks = whole weeks from the event to a
  // fixed reference instant (integer µs floor-division on BOTH engines —
  // no float boundary). The weight is an exact power of two via shiftleft
  // (never pow(), whose libm rounding is engine-specific), so each term
  // is one exact double scaling and the rounded sum is noise-free. Pure
  // projection + one user shuffle with map-side combine — the standard
  // recency-feature shape for churn/LTV models.
  private val q56: (String, QFn, Option[String]) = ("q56_decay_features",
    // ref = 2024-02-05 00:00:00 UTC (the Monday after the data window)
    (s, d) => EventAnalytics.decayedValue(ev(s, d), col("user_id"),
      col("ts"), col("value"), refEpochUs = 1707091200000000L),
    Some("""WITH t AS (SELECT user_id, value,
      |  least(greatest((1707091200000000 - epoch_us(ts)) // 604800000000,
      |    0), 40) AS age_weeks FROM events)
      |SELECT user_id,
      | round(sum(value / ((1::BIGINT << age_weeks)::DOUBLE)), 6)
      |   AS decayed_value,
      | count(*) AS n_events, min(age_weeks) AS latest_age_weeks
      |FROM t GROUP BY user_id""".stripMargin))

  // ------------------------------------------- arg-max / arg-min agg
  // Per event type: the user with the highest / lowest total spend, via
  // max_by/min_by over a composite (total, user_id) ordering. Totals are
  // decimal-exact so the ordering is noise-free, and the struct tiebreak
  // makes ties (same total, different users) deterministic — the oracle
  // replays the same ordering with ranked windows. Two shuffles, both
  // map-side combined: (type, user) partial sums, then a per-type argmax
  // over user-count-sized input.
  private val q57: (String, QFn, Option[String]) = ("q57_arg_extremes",
    (s, d) => ev(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(dec2(col("value"))).as("tot"))
      .groupBy(col("event_type"))
      .agg(
        max_by(col("user_id"), struct(col("tot"), col("user_id")))
          .as("top_user"),
        max(col("tot")).cast("double").as("top_total"),
        min_by(col("user_id"), struct(col("tot"), col("user_id")))
          .as("bottom_user"),
        min(col("tot")).cast("double").as("bottom_total")),
    Some("""WITH t AS (SELECT event_type, user_id,
      |  sum(CAST(value AS DECIMAL(18,2))) AS tot
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT *,
      |  row_number() OVER (PARTITION BY event_type
      |    ORDER BY tot DESC, user_id DESC) AS rmax,
      |  row_number() OVER (PARTITION BY event_type
      |    ORDER BY tot ASC, user_id ASC) AS rmin FROM t)
      |SELECT event_type,
      | max(CASE WHEN rmax = 1 THEN user_id END) AS top_user,
      | CAST(max(CASE WHEN rmax = 1 THEN tot END) AS DOUBLE) AS top_total,
      | max(CASE WHEN rmin = 1 THEN user_id END) AS bottom_user,
      | CAST(max(CASE WHEN rmin = 1 THEN tot END) AS DOUBLE)
      |   AS bottom_total
      |FROM r GROUP BY event_type""".stripMargin))

  // ------------------------------------------------- full outer join
  // Reconciling two per-user aggregates where EACH side has keys the
  // other lacks (even-id clickers vs div-3 purchasers): full outer join,
  // null-flagged sides, coalesced totals. Decimal-exact sums make the
  // compare noise-free; both inputs pre-aggregate before the join so the
  // outer join moves user-count-sized rows, never raw events.
  private val q58: (String, QFn, Option[String]) = ("q58_full_outer",
    (s, d) => {
      val clicks = ev(s, d)
        .filter(col("event_type") === "click" && col("user_id") % 2 === 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          moneySum(dec2(col("value"))).as("click_value"))
      val buys = ev(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") % 3 === 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_buys"),
          moneySum(dec2(col("value"))).as("buy_value"))
      clicks.join(buys, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_buys"), lit(0L)).as("n_buys"),
          round(coalesce(col("click_value"), lit(0.0))
            + coalesce(col("buy_value"), lit(0.0)), 2).as("total_value"),
          when(col("n_clicks").isNull, "buy_only")
            .when(col("n_buys").isNull, "click_only")
            .otherwise(lit("both")).as("side"))
    },
    Some("""WITH c AS (SELECT user_id, count(*) AS n_clicks,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
      |  FROM events WHERE event_type = 'click' AND user_id % 2 = 0
      |  GROUP BY user_id),
      |b AS (SELECT user_id, count(*) AS n_buys,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS buy_value
      |  FROM events WHERE event_type = 'purchase' AND user_id % 3 = 0
      |  GROUP BY user_id)
      |SELECT coalesce(c.user_id, b.user_id) AS user_id,
      | coalesce(n_clicks, 0)::BIGINT AS n_clicks,
      | coalesce(n_buys, 0)::BIGINT AS n_buys,
      | round(coalesce(click_value, 0) + coalesce(buy_value, 0), 2)
      |   AS total_value,
      | CASE WHEN n_clicks IS NULL THEN 'buy_only'
      |      WHEN n_buys IS NULL THEN 'click_only'
      |      ELSE 'both' END AS side
      |FROM c FULL OUTER JOIN b ON c.user_id = b.user_id"""
      .stripMargin))

  // ------------------------------------------- window-function breadth
  // The remaining ANSI window shapes in one per-user pass: lag/lead,
  // first/last value over the full frame, ntile quartiles, percent_rank,
  // cume_dist — all over the SAME (user, ts, event_id) ordering, so
  // Catalyst fuses them into ONE Window operator after one user_id
  // shuffle (ties impossible: event_id is unique). percent_rank/cume_dist
  // are exact k/n rationals → round 6 both sides.
  private val q59: (String, QFn, Option[String]) = ("q59_window_shapes",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      ev(s, d).select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(full).as("first_value"),
        last(col("value")).over(full).as("last_value"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
    },
    Some("""SELECT event_id, user_id, value,
      | lag(value) OVER w AS prev_value,
      | lead(value) OVER w AS next_value,
      | first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |   AS first_value,
      | last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |   AS last_value,
      | ntile(4) OVER w AS quartile,
      | round(percent_rank() OVER w, 6) AS pct_rank,
      | round(cume_dist() OVER w, 6) AS cume
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""
      .stripMargin))

  // --------------------------------------- partitioned layout + pruning
  // The directory-layout half of the storage story (q46 covers bucketing):
  // write events hive-partitioned by event_type, read back with a
  // partition predicate. The filter resolves against DIRECTORIES at plan
  // time — the scan never opens a non-matching file, which at 100 TB is
  // the difference between reading one partition and reading the lake.
  // PlanShapeSpec asserts the scan carries it as a PartitionFilter (no
  // per-row evaluation); the oracle replays filter+agg over the source.
  private val q60: (String, QFn, Option[String]) = ("q60_partition_prune",
    (s, d) => {
      val dir = rtDir("q60", d)
      ev(s, d).select(col("event_id"), col("user_id"), col("value"),
          col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      s.read.parquet(dir).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          moneySum(dec2(col("value"))).as("purchase_value"))
    },
    Some("""SELECT user_id, count(*)::BIGINT AS n_purchases,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY user_id""".stripMargin))

  // ------------------------------------------- CDC snapshot delta (digest)
  // Change-data-capture between two keyed snapshots WITHOUT comparing
  // columns one by one: each side carries an md5 row digest over its
  // canonicalized values (counts + DECIMAL-string money — no raw doubles
  // in the digest, double→string formatting is engine-specific), the full
  // outer join moves only (key, digest, values), and one digest compare
  // classifies insert/update/delete. Emitting ONLY the delta is the point:
  // at 100 TB the output is proportional to what changed, not to the
  // table. Snapshots here are two overlapping event samples (7-mod vs
  // 10-mod), so all three change classes occur.
  private val q61: (String, QFn, Option[String]) = ("q61_cdc_delta",
    (s, d) => {
      def snap(pred: Column) = ev(s, d).filter(pred)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).as("total"))
        .select(col("user_id"), col("n"), col("total"),
          md5(concat_ws("|", col("n"), col("total"))).as("dig"))
      val oldS = snap(col("event_id") % 10 =!= 0)
        .select(col("user_id"), col("n").as("old_n"),
          col("total").as("old_total"), col("dig").as("old_dig"))
      val newS = snap(col("event_id") % 7 =!= 0)
        .select(col("user_id"), col("n").as("new_n"),
          col("total").as("new_total"), col("dig").as("new_dig"))
      oldS.join(newS, Seq("user_id"), "full_outer")
        .withColumn("change_type",
          when(col("old_dig").isNull, "insert")
            .when(col("new_dig").isNull, "delete")
            .when(col("old_dig") =!= col("new_dig"), "update")
            .otherwise(lit("unchanged")))
        .filter(col("change_type") =!= "unchanged")
        .select(col("user_id"), col("change_type"),
          col("old_n"), col("new_n"),
          col("old_total").cast("double").as("old_total"),
          col("new_total").cast("double").as("new_total"))
    },
    Some("""WITH o AS (SELECT user_id, count(*)::BIGINT AS n,
      |  sum(CAST(value AS DECIMAL(18,2))) AS total
      |  FROM events WHERE event_id % 10 <> 0 GROUP BY 1),
      |n AS (SELECT user_id, count(*)::BIGINT AS n,
      |  sum(CAST(value AS DECIMAL(18,2))) AS total
      |  FROM events WHERE event_id % 7 <> 0 GROUP BY 1),
      |od AS (SELECT user_id, n AS old_n, total AS old_total,
      |  md5(n::VARCHAR || '|' || total::VARCHAR) AS old_dig FROM o),
      |nd AS (SELECT user_id, n AS new_n, total AS new_total,
      |  md5(n::VARCHAR || '|' || total::VARCHAR) AS new_dig FROM n),
      |j AS (SELECT coalesce(od.user_id, nd.user_id) AS user_id,
      |  old_n, new_n, old_total, new_total,
      |  CASE WHEN old_dig IS NULL THEN 'insert'
      |       WHEN new_dig IS NULL THEN 'delete'
      |       WHEN old_dig <> new_dig THEN 'update'
      |       ELSE 'unchanged' END AS change_type
      |  FROM od FULL OUTER JOIN nd ON od.user_id = nd.user_id)
      |SELECT user_id, change_type, old_n, new_n,
      | old_total::DOUBLE AS old_total, new_total::DOUBLE AS new_total
      |FROM j WHERE change_type <> 'unchanged'""".stripMargin))

  // ------------------------------------------------ PageRank (iterative)
  // Influence ranking over the bidirectional customer↔supplier trade
  // graph (edges from orders⋈lineitem) — the numeric iterative loop that
  // complements d10's label propagation. Each GraphRank iteration = one
  // edge⋈rank join + one decimal-exact aggregation; the oracle replays
  // the same 3 iterations as a finite CTE chain (see GraphRank scaladoc
  // for the cross-engine float policy).
  private val q62: (String, QFn, Option[String]) = ("q62_pagerank",
    (s, d) => {
      // one supplier edge per order (first line): a 4x smaller graph with
      // the same algorithmic shape — PageRank cost scales with |E| and the
      // l_linenumber=1 predicate pushes to the scan
      val base = Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_linenumber") === 1),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      // mirroring two namespace-disjoint distinct sets ('c…'→'s…' and its
      // reverse) is distinct by construction — dedup BEFORE the mirror
      // shuffles half the rows, and pageRank skips its defensive distinct
      GraphRank.pageRank(
        base.union(base.select(col("dst").as("src"), col("src").as("dst"))),
        iters = 3, assumeDistinct = true)
    },
    Some {
      val iterCtes = (1 to 3).map { i =>
        s"""c$i AS (SELECT e.dst AS node,
           |    CAST(r.rank / deg.deg::DOUBLE AS DECIMAL(20,10)) AS c
           |  FROM edges e JOIN r${i - 1} r ON r.node = e.src
           |  JOIN deg ON deg.src = e.src),
           |s$i AS (SELECT node, sum(c) AS s FROM c$i GROUP BY 1),
           |r$i AS (SELECT n.node,
           |    CAST(round((1::DECIMAL(3,2) - 0.85) + 0.85
           |      * coalesce(s.s, 0::DECIMAL(20,10)), 6) AS DOUBLE) AS rank
           |  FROM nodes n LEFT JOIN s$i s USING (node))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT 'c' || o_custkey AS src,
        |    's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE l_linenumber = 1),
        |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |nodes AS (SELECT src AS node FROM edges
        |  UNION SELECT dst FROM edges),
        |r0 AS (SELECT node, 1.0::DOUBLE AS rank FROM nodes),
        |$iterCtes
        |SELECT node, rank FROM r3""".stripMargin
    })

  // --------------------------------- incremental aggregate maintenance
  // Incremental view maintenance for a distributive aggregate: a standing
  // per-user (count, decimal total) built from history merges with a
  // delta batch by a keys-only outer join + component-wise ⊕ — history
  // raw data is never re-read. The oracle is the SEMANTIC definition
  // (recompute over ALL events), so the driver check asserts the IVM
  // correctness theorem itself: merge(agg(H), agg(Δ)) == agg(H ∪ Δ),
  // exact because decimal sums are associative and order-free. This is
  // the nightly-snapshot + hourly-delta shape that keeps a 100 TB fact
  // table's rollups fresh for the cost of the delta.
  private val q63: (String, QFn, Option[String]) = ("q63_incremental_agg",
    (s, d) => {
      def agg(pred: Column) = ev(s, d).filter(pred)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).as("t"))
      val hist = agg(col("event_id") % 10 =!= 0)
        .select(col("user_id"), col("n").as("hn"), col("t").as("ht"))
      val delta = agg(col("event_id") % 10 === 0)
        .select(col("user_id"), col("n").as("dn"), col("t").as("dt"))
      hist.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("hn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_events"),
          (coalesce(col("ht"), lit(0).cast("decimal(18,2)"))
            + coalesce(col("dt"), lit(0).cast("decimal(18,2)")))
            .cast("double").as("total_value"))
    },
    Some("""SELECT user_id, count(*)::BIGINT AS n_events,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id""".stripMargin))

  // ------------------------------------------------ equi-depth binning
  // Learned quartile edges → bucketize → per-bin stats, with the edges
  // computed EXACTLY (np.percentile interpolation) by Quantiles'
  // distinct-value rank walk — no per-group array buffering (q12's trade)
  // and no approximation (q44's trade). The oracle affords the sorted
  // list and replays the same interpolation expression tree.
  private val q64: (String, QFn, Option[String]) = ("q64_equidepth_bins",
    (s, d) => {
      val sv = ev(s, d).select(col("event_type"), col("value"))
      val edges = Quantiles.exactGroupQuantiles(sv, col("event_type"),
          col("value"), Seq(0.25, 0.5, 0.75))
        .groupBy(col("grp").as("event_type"))
        .agg(max(when(col("frac") === 0.25, col("q"))).as("q1"),
          max(when(col("frac") === 0.5, col("q"))).as("q2"),
          max(when(col("frac") === 0.75, col("q"))).as("q3"))
      sv.join(broadcast(edges), Seq("event_type"))
        .withColumn("bin", when(col("value") <= col("q1"), 0L)
          .when(col("value") <= col("q2"), 1L)
          .when(col("value") <= col("q3"), 2L).otherwise(3L))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"),
          moneySum(dec2(col("value"))).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
    },
    Some {
      def interp(q: String) =
        s"""arr[CAST(floor(($q)*(cnt-1)) AS INT)+1]
           | + (($q)*(cnt-1) - floor(($q)*(cnt-1)))
           |   * (arr[CAST(ceil(($q)*(cnt-1)) AS INT)+1]
           |      - arr[CAST(floor(($q)*(cnt-1)) AS INT)+1])"""
          .stripMargin.replaceAll("\n", "")
      s"""WITH g AS (SELECT event_type, count(*) AS cnt,
        |  list_sort(list(value)) AS arr FROM events GROUP BY 1),
        |e AS (SELECT event_type, ${interp("0.25")} AS q1,
        |  ${interp("0.5")} AS q2, ${interp("0.75")} AS q3 FROM g),
        |b AS (SELECT ev.event_type,
        |  CASE WHEN value <= q1 THEN 0 WHEN value <= q2 THEN 1
        |       WHEN value <= q3 THEN 2 ELSE 3 END AS bin, value
        |  FROM events ev JOIN e USING (event_type))
        |SELECT event_type, bin::BIGINT AS bin, count(*)::BIGINT AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | min(value) AS min_value, max(value) AS max_value
        |FROM b GROUP BY 1, 2""".stripMargin
    })

  // -------------------------------------------- corrupt-tolerant ingest
  // Real feeds carry malformed records; the engine must quarantine, not
  // crash. Every 10th event serializes as TRUNCATED JSON; the PERMISSIVE
  // read nulls failed rows (detected via the never-null event_id — no
  // _corrupt_record reference, which Spark restricts), good rows
  // aggregate, and the quarantine count rides along. The oracle replays
  // the corruption rule against the source table.
  private val q65: (String, QFn, Option[String]) = ("q65_corrupt_tolerant",
    (s, d) => {
      val dir = rtDir("q65", d)
      // corruption must be TOTAL (not truncated JSON): PERMISSIVE keeps
      // any leading fields it managed to parse, so a prefix-valid record
      // would smuggle its event_id through the null-detection
      ev(s, d).select(
          when(col("event_id") % 10 === 0,
            concat(lit("#corrupt "), col("event_id")))
            .otherwise(to_json(struct(col("event_id"), col("user_id"),
              col("value"), col("event_type")))).as("value"))
        .write.mode("overwrite").text(dir)
      val schema = "event_id LONG, user_id LONG, value DOUBLE, " +
        "event_type STRING"
      val read = s.read.schema(schema).option("mode", "PERMISSIVE")
        .json(dir)
      val nCorrupt = read.filter(col("event_id").isNull)
        .agg(count(lit(1)).as("n_corrupt"))
      read.filter(col("event_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          moneySum(dec2(col("value"))).as("sum_value"))
        .crossJoin(broadcast(nCorrupt))
    },
    Some("""SELECT event_type, count(*)::BIGINT AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      | (SELECT count(*) FROM events WHERE event_id % 10 = 0)::BIGINT
      |   AS n_corrupt
      |FROM events WHERE event_id % 10 <> 0
      |GROUP BY event_type""".stripMargin))

  // ------------------------------------- dynamic partition overwrite
  // Partition-level upsert without Delta: the initial load lands STALE
  // data in the click partition (values zeroed); the refresh rewrites
  // ONLY that partition (partitionOverwriteMode=dynamic — a static
  // overwrite would delete every other partition and the oracle compare
  // would catch it). After the refresh the lake equals the source table.
  private val q66: (String, QFn, Option[String]) = ("q66_dynamic_overwrite",
    (s, d) => {
      val dir = rtDir("q66", d)
      val ev0 = ev(s, d).select(col("event_id"), col("user_id"),
        col("value"), col("event_type"))
      ev0.withColumn("value",
          when(col("event_type") === "click", 0.0).otherwise(col("value")))
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      ev0.filter(col("event_type") === "click")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type").parquet(dir)
      s.read.parquet(dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          moneySum(dec2(col("value"))).as("sum_value"))
    },
    Some("""SELECT event_type, count(*)::BIGINT AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin))

  // ------------------------------------------- MAD robust outliers
  // Median absolute deviation — the robust-statistics complement to
  // q12's percentile clamp (one extreme value corrupts a z-score's mean
  // AND σ; the median pair shrugs): per type, med = exact median of
  // value, MAD = exact median of |value − med|, outlier ⇔
  // |value − med| > 3·MAD. Both medians run through Quantiles'
  // distinct-value walk (bounded state, chained passes), and every
  // comparison happens on engine-identical doubles, so the oracle's
  // sorted-list medians replay the exact flag set.
  private val q67: (String, QFn, Option[String]) = ("q67_mad_outliers",
    (s, d) => {
      val sv = ev(s, d).select(col("event_type"), col("value"))
      val med = Quantiles.exactGroupQuantiles(sv, col("event_type"),
          col("value"), Seq(0.5))
        .select(col("grp").as("event_type"), col("q").as("med"))
      val dev = sv.join(broadcast(med), Seq("event_type"))
        .withColumn("_dev", abs(col("value") - col("med")))
      val mad = Quantiles.exactGroupQuantiles(dev, col("event_type"),
          col("_dev"), Seq(0.5))
        .select(col("grp").as("event_type"), col("q").as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum((col("_dev") > lit(3.0) * col("mad")).cast("long"))
            .as("n_outliers"),
          round(max(col("med")), 6).as("med"),
          round(max(col("mad")), 6).as("mad"))
    },
    Some {
      def interp(q: String, arr: String, cnt: String) =
        s"""$arr[CAST(floor(($q)*($cnt-1)) AS INT)+1]
           | + (($q)*($cnt-1) - floor(($q)*($cnt-1)))
           |   * ($arr[CAST(ceil(($q)*($cnt-1)) AS INT)+1]
           |      - $arr[CAST(floor(($q)*($cnt-1)) AS INT)+1])"""
          .stripMargin.replaceAll("\n", "")
      s"""WITH g AS (SELECT event_type, count(*) AS cnt,
        |  list_sort(list(value)) AS arr FROM events GROUP BY 1),
        |m AS (SELECT event_type, ${interp("0.5", "arr", "cnt")} AS med
        |  FROM g),
        |dv AS (SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
        |  FROM events e JOIN m USING (event_type)),
        |g2 AS (SELECT event_type, count(*) AS cnt,
        |  list_sort(list(dev)) AS arr FROM dv GROUP BY 1),
        |md AS (SELECT event_type, ${interp("0.5", "arr", "cnt")} AS mad
        |  FROM g2)
        |SELECT dv.event_type, count(*)::BIGINT AS n,
        | sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END)::BIGINT
        |   AS n_outliers,
        | round(max(dv.med), 6) AS med, round(max(md.mad), 6) AS mad
        |FROM dv JOIN md USING (event_type)
        |GROUP BY dv.event_type""".stripMargin
    })

  // ------------------------------------------- data-quality audit gate
  // The deequ-style ingest contract: five named checks (null rates, key
  // uniqueness, vocabulary width, value bounds) computed in ONE
  // aggregation pass, reported one row per rule. An ETL job gates a
  // load on `min(pass) == 1`; the driver check verifies the whole
  // report against SQL-recomputed metrics.
  private val q68: (String, QFn, Option[String]) = ("q68_dq_audit",
    (s, d) => DataQuality.audit(ev(s, d), Seq(
      DataQuality.AuditRule("event_id_not_null",
        sum(col("event_id").isNull.cast("long")).cast("double")
          / count(lit(1)), _ === 0.0),
      DataQuality.AuditRule("event_id_unique",
        (count(lit(1)) - countDistinct(col("event_id"))).cast("double"),
        _ === 0.0),
      DataQuality.AuditRule("value_not_null",
        sum(col("value").isNull.cast("long")).cast("double")
          / count(lit(1)), _ === 0.0),
      DataQuality.AuditRule("type_vocab_bounded",
        countDistinct(col("event_type")).cast("double"), _ <= 5.0),
      DataQuality.AuditRule("value_nonnegative",
        min(col("value")), _ >= 0.0))),
    Some("""WITH a AS (SELECT count(*)::DOUBLE AS cnt,
      |  sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::DOUBLE AS idn,
      |  (count(*) - count(DISTINCT event_id))::DOUBLE AS dup,
      |  sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::DOUBLE AS vn,
      |  count(DISTINCT event_type)::DOUBLE AS tv,
      |  min(value) AS mv
      |  FROM events)
      |SELECT 'event_id_not_null' AS rule, idn / cnt AS observed,
      |  (idn / cnt = 0.0)::BIGINT AS pass FROM a
      |UNION ALL SELECT 'event_id_unique', dup, (dup = 0.0)::BIGINT FROM a
      |UNION ALL SELECT 'value_not_null', vn / cnt,
      |  (vn / cnt = 0.0)::BIGINT FROM a
      |UNION ALL SELECT 'type_vocab_bounded', tv, (tv <= 5.0)::BIGINT FROM a
      |UNION ALL SELECT 'value_nonnegative', mv, (mv >= 0.0)::BIGINT
      |  FROM a""".stripMargin))

  // ------------------------------------------------- unpivot / melt
  // The inverse of the pivot family: a wide per-user count matrix melts
  // back to long via Dataset.unpivot (ANSI UNPIVOT), dropping the zero
  // cells the wide form materialized. Round-tripping pivot → unpivot →
  // filter must equal the direct long aggregate — the oracle IS that
  // direct form.
  private val q69: (String, QFn, Option[String]) = ("q69_unpivot",
    (s, d) => {
      val aggs = vocab.map(v =>
        count(when(col("event_type") === v, 1)).as(v))
      val wide = ev(s, d).groupBy(col("user_id"))
        .agg(aggs.head, aggs.tail: _*)
      wide.unpivot(Array(col("user_id")), vocab.map(col).toArray,
          "event_type", "n")
        .filter(col("n") > 0)
    },
    Some("""SELECT user_id, event_type, count(*)::BIGINT AS n
      |FROM events GROUP BY 1, 2""".stripMargin))

  // ---------------------------------------------- hopping time windows
  // Overlapping (sliding) event-time windows in BATCH: 1-hour windows
  // every 30 minutes — each event lands in exactly two, which is the
  // trend-smoothing aggregation monitoring uses. Spark's window() emits
  // struct starts aligned to the epoch grid; the oracle replays the two
  // covering windows per event with integer µs floor-division.
  private val q70: (String, QFn, Option[String]) = ("q70_hopping_window",
    (s, d) => ev(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        moneySum(dec2(col("value"))).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value")),
    Some("""WITH x AS (SELECT event_type, value, epoch_us(ts) AS eu
      |  FROM events),
      |u AS (SELECT event_type, value, unnest([
      |    make_timestamp((eu // 1800000000) * 1800000000),
      |    make_timestamp((eu // 1800000000) * 1800000000 - 1800000000)
      |  ]) AS win_start FROM x)
      |SELECT win_start, event_type, count(*)::BIGINT AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM u GROUP BY 1, 2""".stripMargin))

  // --------------------------------------- feature correlation matrix
  // Pearson correlation between per-user spend features, with every
  // MOMENT decimal-exact: per-user totals are narrowed to DECIMAL(15,2)
  // (covers 10^13 cents per user), so products are DECIMAL(31,4) and the
  // moment sums — which Spark caps at DECIMAL(38,4) — keep 10^7 digits'
  // worth of headroom above the max single product (the SUM cap, not the
  // product cap, is the binding constraint at scale: 18,2-wide totals
  // would leave ONE decimal digit and a non-ANSI overflow silently nulls
  // the correlation). At the 38,4 cap the exact form holds ~10^8 users at
  // max-magnitude totals; Σx, Σy, Σxy, Σx², Σy² stay order-independent
  // integers in disguise. Only the final textbook formula runs in IEEE
  // doubles (identical expression tree both engines), rounded 6 dp. The
  // breadth complement to e08's per-dim variance: cross-feature
  // diagnostics.
  private val q71: (String, QFn, Option[String]) = ("q71_correlation",
    (s, d) => {
      val perUser = ev(s, d).groupBy(col("user_id")).agg(
        coalesce(sum(when(col("event_type") === "click",
          dec2(col("value")))), lit(0).cast("decimal(18,2)"))
          .cast("decimal(15,2)").as("x"),
        coalesce(sum(when(col("event_type") === "purchase",
          dec2(col("value")))), lit(0).cast("decimal(18,2)"))
          .cast("decimal(15,2)").as("y"),
        coalesce(sum(when(col("event_type") === "view",
          dec2(col("value")))), lit(0).cast("decimal(18,2)"))
          .cast("decimal(15,2)").as("z"))
      def corrOf(a: Column, b: Column): Column = {
        val n = count(lit(1)).cast("double")
        val num = (n * sum(a * b).cast("double")
          - sum(a).cast("double") * sum(b).cast("double"))
        val dx = (n * sum(a * a).cast("double")
          - sum(a).cast("double") * sum(a).cast("double"))
        val dy = (n * sum(b * b).cast("double")
          - sum(b).cast("double") * sum(b).cast("double"))
        round(num / sqrt(dx * dy), 6)
      }
      perUser.agg(count(lit(1)).as("n_users"),
        corrOf(col("x"), col("y")).as("r_click_purchase"),
        corrOf(col("x"), col("z")).as("r_click_view"),
        corrOf(col("y"), col("z")).as("r_purchase_view"))
    },
    Some {
      def corrSql(a: String, b: String) =
        s"""round((count(*)::DOUBLE * sum($a * $b)::DOUBLE
           | - sum($a)::DOUBLE * sum($b)::DOUBLE)
           | / sqrt((count(*)::DOUBLE * sum($a * $a)::DOUBLE
           |     - sum($a)::DOUBLE * sum($a)::DOUBLE)
           |   * (count(*)::DOUBLE * sum($b * $b)::DOUBLE
           |     - sum($b)::DOUBLE * sum($b)::DOUBLE)), 6)"""
          .stripMargin.replaceAll("\n", "")
      s"""WITH u AS (SELECT user_id,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'click'
        |    THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |    AS DECIMAL(15,2)) AS x,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |    AS DECIMAL(15,2)) AS y,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'view'
        |    THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |    AS DECIMAL(15,2)) AS z
        |  FROM events GROUP BY user_id)
        |SELECT count(*)::BIGINT AS n_users,
        | ${corrSql("x", "y")} AS r_click_purchase,
        | ${corrSql("x", "z")} AS r_click_view,
        | ${corrSql("y", "z")} AS r_purchase_view
        |FROM u""".stripMargin
    })

  // --------------------------------------- entity resolution (blocked)
  // Fuzzy record linkage with the classic two-stage shape: BLOCK first
  // (equi-join on (nation, name length) — candidate pairs bounded per
  // block, never |customers|²), then VERIFY with edit distance on
  // candidates only (the d35 discipline applied to structured records).
  // Pairs within distance 2 are potential duplicates for a steward
  // queue; at scale only the block key changes, not the plan.
  private val q72: (String, QFn, Option[String]) = ("q72_entity_resolution",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey").as("id"),
        col("c_name").as("name"), col("c_nationkey").as("nat"),
        length(col("c_name")).as("_len"))
      c.select(col("id").as("a"), col("name").as("na"), col("nat"),
          col("_len"))
        .join(c.select(col("id").as("b"), col("name").as("nb"),
          col("nat"), col("_len")), Seq("nat", "_len"))
        .filter(col("a") < col("b"))
        .withColumn("dist", levenshtein(col("na"), col("nb")))
        .filter(col("dist") <= 2)
        .groupBy(col("nat"))
        .agg(count(lit(1)).as("n_pairs"), min(col("dist")).as("min_dist"))
    },
    Some("""WITH c AS (SELECT c_custkey AS id, c_name AS name,
      |  c_nationkey AS nat, length(c_name) AS len FROM customer),
      |p AS (SELECT x.nat, levenshtein(x.name, y.name) AS dist
      |  FROM c x JOIN c y ON x.nat = y.nat AND x.len = y.len
      |   AND x.id < y.id)
      |SELECT nat, count(*)::BIGINT AS n_pairs,
      | min(dist)::BIGINT AS min_dist
      |FROM p WHERE dist <= 2 GROUP BY nat""".stripMargin))

  // --------------------------------------- percent-of-parent hierarchy
  // BI-style hierarchical shares: revenue per (region, nation) with each
  // nation's share of its region and each region's share of the total —
  // windows over the AGGREGATED frame (region-count-sized), never over
  // fact rows; decimal-exact revenue so the ratios are noise-free.
  private val q73: (String, QFn, Option[String]) = ("q73_pct_of_parent",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec2(col("l_extendedprice"))).as("rev"))
      val wr = Window.partitionBy(col("r_name"))
      val wAll = Window.partitionBy()
      rev.select(col("r_name"), col("n_name"),
          col("rev").cast("double").as("revenue"),
          round(col("rev").cast("double")
            / sum(col("rev")).over(wr).cast("double"), 6)
            .as("pct_of_region"),
          round(sum(col("rev")).over(wr).cast("double")
            / sum(col("rev")).over(wAll).cast("double"), 6)
            .as("region_pct_of_total"))
    },
    Some("""WITH rev AS (SELECT r_name, n_name,
      |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      |  FROM lineitem
      |   JOIN orders ON l_orderkey = o_orderkey
      |   JOIN customer ON o_custkey = c_custkey
      |   JOIN nation ON c_nationkey = n_nationkey
      |   JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2)
      |SELECT r_name, n_name, rev::DOUBLE AS revenue,
      | round(rev::DOUBLE
      |   / (sum(rev) OVER (PARTITION BY r_name))::DOUBLE, 6)
      |   AS pct_of_region,
      | round((sum(rev) OVER (PARTITION BY r_name))::DOUBLE
      |   / (sum(rev) OVER ())::DOUBLE, 6) AS region_pct_of_total
      |FROM rev""".stripMargin))

  // ------------------------------------------------ winsorized mean
  // The third robust-stats form (q12 repairs, q67 flags, this AGGREGATES
  // robustly): clamp values at the exact [p05, p95] quantiles, then a
  // decimal-exact mean of the clamped values — the headline metric that
  // one fat-finger row can no longer move. Clamped doubles pass through
  // DECIMAL(18,6) (half-up both engines) so the mean is order-free.
  private val q74: (String, QFn, Option[String]) = ("q74_winsorized_mean",
    (s, d) => {
      val sv = ev(s, d).select(col("event_type"), col("value"))
      val edges = Quantiles.exactGroupQuantiles(sv, col("event_type"),
          col("value"), Seq(0.05, 0.95))
        .groupBy(col("grp").as("event_type"))
        .agg(max(when(col("frac") === 0.05, col("q"))).as("lo"),
          max(when(col("frac") === 0.95, col("q"))).as("hi"))
      sv.join(broadcast(edges), Seq("event_type"))
        .withColumn("_w", least(greatest(col("value"), col("lo")),
          col("hi")).cast("decimal(18,6)"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("_w")).cast("double") / count(lit(1)), 6)
            .as("winsorized_mean"),
          round(sum(dec2(col("value"))).cast("double") / count(lit(1)), 6)
            .as("raw_mean"))
    },
    Some {
      def interp(q: String) =
        s"""arr[CAST(floor(($q)*(cnt-1)) AS INT)+1]
           | + (($q)*(cnt-1) - floor(($q)*(cnt-1)))
           |   * (arr[CAST(ceil(($q)*(cnt-1)) AS INT)+1]
           |      - arr[CAST(floor(($q)*(cnt-1)) AS INT)+1])"""
          .stripMargin.replaceAll("\n", "")
      s"""WITH g AS (SELECT event_type, count(*) AS cnt,
        |  list_sort(list(value)) AS arr FROM events GROUP BY 1),
        |e AS (SELECT event_type, ${interp("0.05")} AS lo,
        |  ${interp("0.95")} AS hi FROM g),
        |w AS (SELECT ev.event_type,
        |  CAST(least(greatest(value, lo), hi) AS DECIMAL(18,6)) AS wv,
        |  CAST(value AS DECIMAL(18,2)) AS rv
        |  FROM events ev JOIN e USING (event_type))
        |SELECT event_type, count(*)::BIGINT AS n,
        | round(sum(wv)::DOUBLE / count(*), 6) AS winsorized_mean,
        | round(sum(rv)::DOUBLE / count(*), 6) AS raw_mean
        |FROM w GROUP BY 1""".stripMargin
    })

  // --------------------------------------- calendar gap fill + carry
  // Time-series regularization: a per-user DAILY spine (sequence from the
  // user's first to last active day), daily totals left-joined onto it,
  // gaps forward-filled with the last known total (ignore-nulls window).
  // The spine explode is bounded by each user's active SPAN, the fill
  // window rides the one user shuffle, and totals stay decimal-exact —
  // this is the resample().ffill() of the pandas world as one plan.
  private val q75: (String, QFn, Option[String]) = ("q75_gap_fill",
    (s, d) => {
      val daily = ev(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(dec2(col("value"))).as("total"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
        .select(col("user_id"), explode(sequence(col("_d0"), col("_d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("total"), lit(0).cast("decimal(18,2)"))
            .cast("double").as("day_total"),
          last(col("total"), ignoreNulls = true).over(w)
            .cast("double").as("carried"),
          col("total").isNull.cast("long").as("is_gap"))
    },
    Some("""WITH t AS (SELECT user_id, date_trunc('day', ts) AS day,
      |  sum(CAST(value AS DECIMAL(18,2))) AS total
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1
      |  FROM t GROUP BY 1),
      |spine AS (SELECT user_id,
      |  unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM b),
      |j AS (SELECT spine.user_id, spine.day, t.total
      |  FROM spine LEFT JOIN t USING (user_id, day))
      |SELECT user_id, day, coalesce(total, 0)::DOUBLE AS day_total,
      | (last_value(total IGNORE NULLS) OVER (PARTITION BY user_id
      |   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |  )::DOUBLE AS carried,
      | (total IS NULL)::BIGINT AS is_gap
      |FROM j""".stripMargin))

  val defs: Seq[(String, QFn, Option[String])] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
    q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q26b, q27,
    q28, q29, q30, q31, q32, q33, q34, q35, q36, q37, q38, q39, q40, q41,
    q42, q43, q44, q45, q46, q47, q48, q49, q50, q51, q52, q53, q54, q55,
    q56, q57, q58, q59, q60, q61, q62, q63, q64, q65, q66, q67, q68, q69,
    q70, q71, q72, q73, q74, q75)
}
