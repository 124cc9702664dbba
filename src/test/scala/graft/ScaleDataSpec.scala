package graft

/** Fail-fast guards on the synthetic scale-fixture generator (r17
  * ADVICE): the doc_id re-ID domain contract (doc_id ∈ [0, 10⁹), see
  * ScaleData.DocStride scaladoc) must be enforced at BUILD time, not
  * discovered later inside the cross-modal queries' assert_true. */
class ScaleDataSpec extends SparkSpec {

  test("build refuses a copies count that overflows the doc_id domain") {
    // 101 copies × 10⁷ stride > 10⁹ — must throw before any IO
    val e = intercept[IllegalArgumentException] {
      ScaleData.build(spark, "/nonexistent", "/tmp/never_written", 101)
    }
    assert(e.getMessage.contains("overflows the doc_id domain"))
    assert(!new java.io.File("/tmp/never_written").exists)
  }

  test("build refuses a source corpus whose doc_ids exceed one stride") {
    // simulate rescaling an already-scaled dir: doc_ids >= 10⁷
    val dir = java.nio.file.Files
      .createTempDirectory("scaledata_guard").toFile
    try {
      import org.apache.spark.sql.functions._
      spark.range(0L, 5L)
        .select((col("id") + 20000000L).as("doc_id"),
          lit("t").as("text"), lit("en").as("lang"),
          lit("web").as("source"), lit(1L).as("n_chars"))
        .write.mode("overwrite")
        .parquet(s"${dir.getPath}/documents.parquet")
      val e = intercept[IllegalArgumentException] {
        ScaleData.build(spark, dir.getPath, s"${dir.getPath}/out", 10)
      }
      assert(e.getMessage.contains("already a scaled fixture"))
      assert(!new java.io.File(s"${dir.getPath}/out").exists)
    } finally rmTree(dir)
  }
}
