package graft

import java.nio.file.Files
import graft.pipeline.{SequenceModel, TreeEnsembleModel, TreeLeaf, TreeSplit}
import graft.schema.Tables

/** The `run.py in.csv out.csv` CLI contract, end to end on a synthetic
  * transactions CSV: model-driven vocabulary, 6012 drop, vanished-user
  * max-score fallback, user-sorted single-file CSV output. */
class SubmitSpec extends SparkSpec {

  // two-tree model over numeric MCC codes; freq_* names induce the vocab
  private val model = TreeEnsembleModel(
    featureNames = Seq("freq_5411", "freq_5812", "proc_5411", "td_mean"),
    bias = 0.5,
    trees = Seq(
      TreeSplit("freq_5411", 2.0, TreeLeaf(-0.1), TreeLeaf(0.3)),
      TreeSplit("proc_5411", 100.0, TreeLeaf(0.0), TreeLeaf(0.05))))

  private def ts(i: Int): String =
    f"2023-01-01 10:${i / 60}%02d:${i % 60}%02d"

  private def csvOf(rows: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_submit_in").toFile
    val f = new java.io.File(dir, "tx.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("user_id,mcc_code,currency_rk,transaction_amt,transaction_dttm")
    rows.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  test("Submit.run scores users, drops 6012, falls back vanished users") {
    // user 1: 30×5411 (amt 11..40) then 30×5812, strictly increasing ts —
    // trim(20) keeps exactly rows 21..40 = ten 5411 + ten 5812.
    // Repair: both codes frequent (30 > nMcc=10); 5411's clamp window is
    // [P(1/3), P(2/3)] of 11..40 ≈ [20.67, 30.33], so the kept 5411 amounts
    // (31..40) all repair to the median 25.5 -> proc_5411 = 255.
    // user 2: ONLY 6012 rows -> trimmed+dropped away -> max-score fallback.
    val rows =
      (1 to 30).map(i => s"1,5411,48,${10 + i}.0,${ts(i)}") ++
      (1 to 30).map(i => s"1,5812,48,${5 + i}.0,${ts(30 + i)}") ++
      (1 to 5).map(i => s"2,6012,48,99.0,${ts(100 + i)}")
    val in = csvOf(rows)
    val out = Submit.run(spark, in, model).collect()

    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "user-sorted output")
    val byUser = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // freq_5411 = 10 > 2 -> +0.3; proc_5411 = 255 > 100 -> +0.05
    assert(byUser(1L) == 0.85, s"score was ${byUser(1L)}") // round(·,6) of bias+0.3+0.05
    // user 2 vanished -> carries the max target (here: user 1's score)
    assert(byUser(2L) == byUser(1L), "fallback is max of scored targets")
    rmTree(new java.io.File(in).getParentFile)
  }

  test("submission CSV sink: single part, header, user-sorted") {
    // 50 rows per user so trim(20) leaves 10 scored rows each
    val rows =
      (1 to 50).map(i => s"7,5411,48,${10 + i}.0,${ts(i)}") ++
      (1 to 50).map(i => s"3,5812,48,${5 + i}.0,${ts(i)}")
    val in = csvOf(rows)
    val outDir = s"${sys.props("java.io.tmpdir")}/graft_submit_out"
    Tables.writeCsv(Submit.run(spark, in, model), outDir, singleFile = true)
    val files = new java.io.File(outDir).listFiles
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 1, "coalesce(1) must emit exactly one csv part")
    val lines = scala.io.Source.fromFile(files.head, "UTF-8")
      .getLines().toSeq
    assert(lines.head == "user_id,target")
    assert(lines.tail.map(_.takeWhile(_ != ',').toLong) == Seq(3L, 7L))
    rmTree(new java.io.File(outDir))
    rmTree(new java.io.File(in).getParentFile)
  }

  test("converted CatBoost-JSON artifact drives Submit end to end") {
    // fixture -> tools/convert_catboost_json.py -> model.txt -> CLI model.
    // The fixture's oblivious trees expand as: node depth k tests
    // splits[d-1-k], leaf index = bit pattern, values scaled by 2.0.
    val fixture = new java.io.File(
      getClass.getResource("/graft/model_cb_fixture.json").toURI)
    val outTxt = Files.createTempFile("graft_cb_model", ".txt").toFile
    val converter = new java.io.File("tools/convert_catboost_json.py")
    assume(converter.isFile, "run from the repo root")
    val rc = new ProcessBuilder("python3", converter.getPath,
      fixture.getPath, outTxt.getPath).inheritIO().start().waitFor()
    assume(rc == 0, "python3 with the converter must be runnable")
    val converted = TreeEnsembleModel.fromFile(outTxt.getPath)
    // hand-expanded expectation (scale 2.0 folded into leaves, bias 0.25)
    assert(converted == TreeEnsembleModel(
      Seq("freq_5411", "proc_5411"), 0.25,
      Seq(
        TreeSplit("proc_5411", 100.0,
          TreeSplit("freq_5411", 2.0, TreeLeaf(0.2), TreeLeaf(0.4)),
          TreeSplit("freq_5411", 2.0, TreeLeaf(0.6), TreeLeaf(0.8))),
        TreeSplit("proc_5411", 200.0, TreeLeaf(-0.1), TreeLeaf(0.3)))))
    // end to end through the CLI dataflow with the converted (not
    // hand-written) artifact: user 1's features are freq_5411=10,
    // proc_5411=255 (see the first test's derivation) ->
    // tree1: proc>100, freq>2 -> 0.8; tree2: proc>200 -> 0.3; +bias = 1.35
    val rows =
      (1 to 30).map(i => s"1,5411,48,${10 + i}.0,${ts(i)}") ++
      (1 to 30).map(i => s"1,5812,48,${5 + i}.0,${ts(30 + i)}")
    val in = csvOf(rows)
    val out = Submit.run(spark, in, converted).collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.35)))
    outTxt.delete()
    rmTree(new java.io.File(in).getParentFile)
  }

  // --- RNN branch -----------------------------------------------------

  /** Tiny seqmodel over the reference's 7 tx features; only
    * transaction_amt carries pd.cut edges, the rest are raw ints
    * (out-of-card indices clamp to the padding row). */
  private val seqModel = SequenceModel.synthetic(
    Seq(("hour", 23, 2), ("mcc_code", 4, 2), ("currency_rk", 3, 1),
      ("transaction_amt", 2, 2), ("day", 6, 1), ("month", 12, 2),
      ("number_day", 31, 2)),
    hidden = 3, clsUnits = 4, seqLen = 4, seed = 99L,
    edges = Map("transaction_amt" -> Array(0.0, 10.0, 20.0)))

  test("Submit RNN branch: digitize -> right-padded sequences -> native GRU score") {
    // 2023-01-02 is a Monday (day 0). amt 5 -> bin 0, 15 -> bin 1,
    // 25 -> out of range -> 0 (pandas would crash; we clamp to padding).
    val rows = Seq(
      "1,1,1,5.0,2023-01-02 10:00:00",
      "1,2,1,15.0,2023-01-02 10:00:01",
      "1,1,1,25.0,2023-01-02 10:00:02",
      "2,3,1,,2023-01-02 11:00:00") // null amt -> dropna -> fallback
    val in = csvOf(rows)
    val out = Submit.runSeq(spark, in, seqModel).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "user-sorted")
    val byUser = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand-assembled expected sequence for user 1 (T=4, RIGHT-padded):
    // [hour, mcc, cur, amt_bin, day, month, number_day]
    val expectSeq = Array(
      Array(10, 1, 1, 0, 0, 1, 2),
      Array(10, 2, 1, 1, 0, 1, 2),
      Array(10, 1, 1, 0, 0, 1, 2),
      Array(0, 0, 0, 0, 0, 0, 0))
    val expect = BigDecimal(seqModel.forward(expectSeq))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byUser(1L) == expect, s"got ${byUser(1L)}, want $expect")
    assert(byUser(2L) == byUser(1L), "vanished user carries max target")
    rmTree(new java.io.File(in).getParentFile)
  }

  test("Submit dispatches on the artifact header (seqmodel vs tree)") {
    val f = Files.createTempFile("graft_seq_model", ".txt").toFile
    val w = new java.io.PrintWriter(f, "UTF-8")
    seqModel.toLines.foreach(w.println)
    w.close()
    assert(SequenceModel.isSequenceArtifact(f.getPath))
    val back = SequenceModel.fromFile(f.getPath)
    assert(back.features == seqModel.features &&
      back.seqLen == seqModel.seqLen)
    f.delete()
  }

  test("committed converted reference checkpoint scores the RNN branch") {
    // the real artifact (128 hidden, 300 steps): end-to-end smoke with
    // determinism — two runs, same scores, probabilities in (0,1)
    val m = SequenceModel.fromResource("/graft/seq_model_tx.txt.gz")
    val rows = Seq(
      "1,5411,48,100.0,2023-01-02 10:00:00",
      "1,5812,48,-50.0,2023-01-02 10:00:01",
      "2,6011,48,20.0,2023-01-02 11:00:00")
    val in = csvOf(rows)
    val a = Submit.runSeq(spark, in, m).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Submit.runSeq(spark, in, m).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "scoring must be deterministic")
    assert(a.values.forall(p => p > 0.0 && p < 1.0))
    assert(a.keySet == Set(1L, 2L))
    rmTree(new java.io.File(in).getParentFile)
  }

  test("model artifact roundtrips through fromFile (CLI model swap)") {
    val f = Files.createTempFile("graft_model", ".txt").toFile
    val w = new java.io.PrintWriter(f, "UTF-8")
    TreeEnsembleModel.toLines(model).foreach(w.println)
    w.close()
    val back = TreeEnsembleModel.fromFile(f.getAbsolutePath)
    assert(back == model)
    f.delete()
  }
}
