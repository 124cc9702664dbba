package graft

import java.nio.file.Files
import graft.pipeline.{TreeEnsembleModel, TreeLeaf, TreeSplit}
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
