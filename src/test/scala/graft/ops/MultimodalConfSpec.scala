package graft.ops

import graft.SparkSpec

/** A local-disk FileSystem under a scheme that exists ONLY where the
  * driver's Hadoop conf registers `fs.graftfs.impl` — the stand-in for an
  * s3a endpoint whose credentials live in `spark.hadoop.*`. */
class GraftFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

/** Proves the r11 ADVICE medium finding is fixed: `exportPayloadFiles`'
  * partition function must build its FileSystem from the DRIVER's resolved
  * Hadoop conf (shipped via broadcast SerializableConfiguration), not a
  * bare executor-side `new Configuration()` — the bare form drops every
  * `spark.hadoop.*` session setting (s3a credentials, endpoints), which
  * works in local mode and breaks on a cluster. */
class MultimodalConfSpec extends SparkSpec {
  import spark.implicits._

  test("exportPayloadFiles resolves the executor-side FS from driver conf") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.graftfs.impl", classOf[GraftFs].getName)
    // Cache disabled: with the FS cache on, the task (same JVM in local
    // mode) would silently reuse the instance the driver's own delete/
    // mkdirs created, and the spec could not tell a bare
    // `new Configuration()` (no fs.graftfs.impl → "No FileSystem for
    // scheme" — the r11 bug) from the broadcast driver conf.
    hconf.set("fs.graftfs.impl.disable.cache", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft_mmconf")
    try {
      val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](4, 5)))
        .toDF("doc_id", "payload")
      Multimodal.exportPayloadFiles(df, "doc_id", "payload",
        s"graftfs://$dir", "bin")
      val f1 = java.nio.file.Paths.get(dir.toString, "doc_1.bin")
      val f2 = java.nio.file.Paths.get(dir.toString, "doc_2.bin")
      assert(java.nio.file.Files.readAllBytes(f1).toSeq === Seq[Byte](1, 2, 3))
      assert(java.nio.file.Files.readAllBytes(f2).toSeq === Seq[Byte](4, 5))
    } finally {
      hconf.unset("fs.graftfs.impl")
      hconf.unset("fs.graftfs.impl.disable.cache")
      rmTree(dir.toFile)
    }
  }
}
