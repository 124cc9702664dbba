package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing range-frame window (q48) and edit-distance verification (d35). */
class EditWindowSpec extends SparkSpec {

  import spark.implicits._

  test("trailing-hour RANGE frame: tie rows share a frame; old rows age out") {
    val rows = Seq( // (user, sec, value)
      (1L, 0L, 1.0), (1L, 1800L, 2.0), (1L, 3599L, 4.0),
      (1L, 3600L, 8.0),   // 0 s row is now outside the 3599-back frame
      (1L, 7200L, 16.0),  // only itself
      (2L, 100L, 32.0), (2L, 100L, 64.0)) // tie: shared frame
      .toDF("user_id", "sec", "value")
    val w = Window.partitionBy($"user_id").orderBy($"sec")
      .rangeBetween(-3599, 0)
    val out = rows
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum($"value").over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out((1L, 0L, 1.0)) == ((1L, 1.0)))
    assert(out((1L, 1800L, 2.0)) == ((2L, 3.0)))
    assert(out((1L, 3599L, 4.0)) == ((3L, 7.0)))
    assert(out((1L, 3600L, 8.0)) == ((3L, 14.0))) // 1800,3599,3600
    assert(out((1L, 7200L, 16.0)) == ((1L, 16.0)))
    // RANGE (not ROWS): both tie rows see both values
    assert(out((2L, 100L, 32.0)) == ((2L, 96.0)))
    assert(out((2L, 100L, 64.0)) == ((2L, 96.0)))
  }

  test("edit verification: near-identical candidates pass, distinct fail") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content altogether here now"))
      .toDF("a", "ta")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val tb = docs.select($"a".as("b"), $"ta".as("tb"))
    val out = pairs.join(docs, Seq("a")).join(tb, Seq("b"))
      .withColumn("lev", levenshtein($"ta", $"tb").cast("long"))
      .withColumn("nsim", lit(1.0) - $"lev".cast("double")
        / greatest(length($"ta"), length($"tb")).cast("double"))
      .select($"a", $"b", $"lev", $"nsim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out((1L, 2L))._1 == 3L) // dog -> cat
    assert(out((1L, 2L))._2 > 0.9)
    assert(out((1L, 3L))._2 < 0.5)
  }

  test("q72 banded blocking finds duplicates whose typo changes the length") {
    // the case exact-length blocking (rounds 1-6) silently missed: a
    // deletion typo shifts the name length, so the true pair never shared
    // a block. Planted: id2 = id1 minus one char (dist 1, Δlen 1) and
    // id3 = id1 minus two chars (dist 2, Δlen 2 — needs the full ±2 band;
    // a ±1 band would still miss it).
    val dir = java.nio.file.Files.createTempDirectory("graft_q72").toFile
    try {
      Seq(
        (1L, "Customer#000000001", 7L),
        (2L, "Customer#00000001", 7L),
        (3L, "Customer#0000001", 7L),
        (4L, "Totally Unrelated Name!!", 7L))
        .toDF("c_custkey", "c_name", "c_nationkey")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val out = graft.SparkEntry.queries("q72_entity_resolution")(
        spark, dir.toString).collect()
      assert(out.length == 1)
      // (1,2) d=1, (2,3) d=1, (1,3) d=2 — each found exactly once
      assert(out.head.getAs[Long]("n_pairs") == 3L)
      assert(out.head.getAs[Int]("min_dist") == 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
