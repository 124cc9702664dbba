package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The real Y4M codec behind m10/m11: parameter-tolerant header parsing
  * per the yuv4mpeg spec, loud failure on malformed bytes, and the Spark
  * batch plumbing (frame sampling, SAD scene cuts) over it. */
class Y4mSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def mkVideo(nf: Int, w: Int = 4, h: Int = 2): Y4m.Video =
    Y4m.Video(w, h, 25, 1, Array.tabulate(nf)(f =>
      Array.tabulate(w * h)(i => ((f * 31 + i * 7) % 256).toByte)))

  test("encode/decode roundtrip preserves every frame byte") {
    val v = mkVideo(3)
    val back = Y4m.decode(Y4m.encode(v))
    assert((back.width, back.height, back.fpsNum, back.fpsDen) ===
      ((4, 2, 25, 1)))
    assert(back.frames.length === 3)
    v.frames.zip(back.frames).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq) }
  }

  test("decode tolerates unknown header/frame params per the spec") {
    val plane = Array.tabulate[Byte](8)(_.toByte)
    val bytes = ascii("YUV4MPEG2 W4 H2 F30:1 Ip A128:117 Cmono " +
      "XYSCSS=mono\nFRAME Xtimecode=1\n") ++ plane
    val v = Y4m.decode(bytes)
    assert((v.width, v.height, v.fpsNum, v.fpsDen) === ((4, 2, 30, 1)))
    assert(v.frames(0).toSeq === plane.toSeq)
  }

  test("decode rejects malformed bytes loudly") {
    val ok = Y4m.encode(mkVideo(2))
    intercept[IllegalArgumentException](Y4m.decode(ok.dropRight(1)))
    intercept[IllegalArgumentException](Y4m.decode(ok :+ 0.toByte))
    intercept[IllegalArgumentException](Y4m.decode(
      ascii("YUV4MPEG3 W4 H2 F25:1 Cmono\n")))          // wrong magic
    intercept[IllegalArgumentException](Y4m.decode(
      ascii("YUV4MPEG2 W4 F25:1 Cmono\nFRAME\n") ++ new Array[Byte](8)))
    intercept[IllegalArgumentException](Y4m.decode(     // default C420
      ascii("YUV4MPEG2 W4 H2 F25:1\nFRAME\n") ++ new Array[Byte](8)))
    intercept[IllegalArgumentException](Y4m.decode(     // chroma form
      ascii("YUV4MPEG2 W4 H2 F25:1 C420\nFRAME\n") ++ new Array[Byte](12)))
    intercept[IllegalArgumentException](Y4m.decode(     // w*h Int wrap
      ascii("YUV4MPEG2 W65536 H65536 F25:1 Cmono\nFRAME\n")))
  }

  test("videoFrameSampleBatched: thumbnail-strip indices, exact stats") {
    val df = Seq((1L, Y4m.encode(mkVideo(10)))).toDF("doc_id", "payload")
    val got = Multimodal.videoFrameSampleBatched(df, "doc_id", "payload", 4)
      .orderBy("j").collect()
    assert(got.map(_.getAs[Long]("frame_idx")).toSeq ===
      Seq(0L, 3L, 6L, 9L))                 // j*(10-1) div 3
    assert(got.forall(_.getAs[Long]("n_frames") == 10L))
    assert(got.forall(_.getAs[Long]("duration_ms") == 400L)) // 10 / 25fps
    val v = mkVideo(10)
    got.foreach { r =>
      val fr = v.frames(r.getAs[Long]("frame_idx").toInt).map(_ & 0xff)
      assert(r.getAs[Long]("px_sum") === fr.map(_.toLong).sum)
      assert(r.getAs[String]("px_csv") === fr.mkString(","))
    }
  }

  test("sceneCutsBatched: SAD 0 inside a run, exact SAD at a hard cut") {
    // three frames: two identical, then a +1-everywhere change
    val a = Array.tabulate[Byte](8)(i => (i * 3).toByte)
    val b = a.map(x => (x + 1).toByte)
    val vid = Y4m.Video(4, 2, 25, 1, Array(a, a.clone(), b))
    val df = Seq((7L, Y4m.encode(vid))).toDF("doc_id", "payload")
    val got = Multimodal.sceneCutsBatched(df, "doc_id", "payload")
      .orderBy("f").collect()
    assert(got.map(r => (r.getAs[Long]("f"), r.getAs[Long]("sad"))).toSeq
      === Seq((1L, 0L), (2L, 8L)))
  }

  test("videoThumbnailsBatched: exact nearest-neighbor picks through a " +
      "real strip re-encode; upscale and zero-frame fail loudly") {
    // 16x8 frames whose pixel (y,x) = y*16+x, so the 4x4 thumbnail's
    // pixel (ty,tx) must be src(2ty, 4tx) = (2ty)*16 + 4tx exactly
    val w = 16; val h = 8
    val v = Y4m.Video(w, h, 25, 1, Array.tabulate(5)(f =>
      Array.tabulate(w * h)(i => ((i + f) % 256).toByte)))
    val df = Seq((1L, Y4m.encode(v))).toDF("doc_id", "payload")
    val got = Multimodal.videoThumbnailsBatched(df, "doc_id", "payload",
      k = 4, tw = 4, th = 4).orderBy("j").collect()
    assert(got.map(_.getAs[Long]("frame_idx")).toSeq ===
      Seq(0L, 1L, 2L, 4L)) // j*(5-1) div 3
    got.foreach { r =>
      val f = r.getAs[Long]("frame_idx").toInt
      val want = for (ty <- 0 until 4; tx <- 0 until 4)
        yield ((2 * ty) * 16 + 4 * tx + f) % 256
      assert(r.getAs[String]("px_csv") === want.mkString(","))
      assert(r.getAs[Long]("px_sum") === want.map(_.toLong).sum)
    }
    // upscale is a contract violation, not a silent stretch
    val tiny = Seq((2L, Y4m.encode(mkVideo(2)))).toDF("doc_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.videoThumbnailsBatched(tiny, "doc_id", "payload",
        k = 2, tw = 8, th = 8).collect()
    }
    assert(ex.getMessage.contains("upscale")
      || Option(ex.getCause).exists(_.getMessage.contains("upscale")))
  }

  test("videoStripSummaryBatched equals videoThumbnailsBatched folded " +
      "to one row per clip (same decode/sample/resize/roundtrip)") {
    val w = 16; val h = 8
    val df = Seq(
      (1L, Y4m.encode(Y4m.Video(w, h, 25, 1, Array.tabulate(5)(f =>
        Array.tabulate(w * h)(i => ((i + f) % 256).toByte))))),
      (2L, Y4m.encode(Y4m.Video(w, h, 25, 1, Array.tabulate(9)(f =>
        Array.tabulate(w * h)(i => ((i * 3 + f * 17) % 256).toByte))))))
      .toDF("doc_id", "payload")
    val thumbs = Multimodal.videoThumbnailsBatched(df, "doc_id", "payload",
        k = 4, tw = 4, th = 4)
      .orderBy("doc_id", "j").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val summary = Multimodal.videoStripSummaryBatched(df, "doc_id",
        "payload", k = 4, tw = 4, th = 4).collect()
    assert(summary.length == 2) // ONE row per clip, no fanout
    summary.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = thumbs(id)
      assert(r.getAs[Long]("n_frames") === t.head.getAs[Long]("n_frames"))
      assert(r.getAs[Long]("px_sum") ===
        t.map(_.getAs[Long]("px_sum")).sum)
      assert(r.getAs[String]("px_csv") ===
        t.map(_.getAs[String]("px_csv")).mkString(","))
    }
    // contract violations fail loudly, like the thumbnail strip's
    val tiny = Seq((3L, Y4m.encode(mkVideo(2)))).toDF("doc_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.videoStripSummaryBatched(tiny, "doc_id", "payload",
        k = 2, tw = 8, th = 8).collect()
    }
    assert(ex.getMessage.contains("upscale")
      || Option(ex.getCause).exists(_.getMessage.contains("upscale")))
  }

  test("videoFingerprintBatched collapses frame-rate-shifted re-encodes " +
      "at any integer factor; distinct content differs") {
    // 16x8 frames, distinct content per frame and per video
    def vid(seed: Int, nf: Int): Y4m.Video =
      Y4m.Video(16, 8, 25, 1, Array.tabulate(nf)(f =>
        Array.tabulate(128)(i => ((i * 7 + f * 31 + seed) % 256).toByte)))
    val base = Seq((1L, Y4m.encode(vid(0, 5))), (2L, Y4m.encode(vid(99, 5))))
      .toDF("doc_id", "payload")
    def fp(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Multimodal.videoFingerprintBatched(
          df.withColumn("tag", lit("t")), "doc_id", "tag", "payload",
          k = 4, tw = 4, th = 4)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("ahash_lo"), r.getAs[Long]("ahash_hi"))).toMap
    val f1 = fp(base)
    val f2 = fp(Multimodal.duplicateFramesBatched(base, "doc_id", "payload", 2))
    val f3 = fp(Multimodal.duplicateFramesBatched(base, "doc_id", "payload", 3))
    assert(f1(1L) === f2(1L) && f1(1L) === f3(1L)) // rate-invariant
    assert(f1(2L) === f2(2L) && f1(2L) === f3(2L))
    assert(f1(1L) !== f1(2L))                      // content-sensitive
    // the hash must fill exactly one 64-bit word
    intercept[IllegalArgumentException] {
      Multimodal.videoFingerprintBatched(
        base.withColumn("tag", lit("t")), "doc_id", "tag", "payload",
        k = 3, tw = 4, th = 4)
    }
    // the duplicated re-encode is a REAL container at the doubled rate
    val d = Y4m.decode(Multimodal.duplicateFramesBatched(
        base, "doc_id", "payload", 2)
      .collect().head.getAs[Array[Byte]]("payload"))
    assert(d.fpsNum === 50 && d.frames.length === 10)
  }

  test("m15 corpus invariant: every clip and its 2x re-encode share one " +
      "bucket; zero false merges at sf0.001") {
    val out = graft.SparkEntry.queries("m15_video_phash_dedup")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length % 2 === 0)
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rows) =>
      assert(rows.length === 2, s"doc $id: expected orig+dup2")
      val hs = rows.map(r =>
        (r.getAs[Long]("ahash_hi"), r.getAs[Long]("ahash_lo"))).distinct
      assert(hs.length === 1, s"doc $id: variants split buckets")
      rows.foreach(r => assert(r.getAs[Long]("bucket_n") === 2L,
        s"doc $id: bucket_n ${r.getAs[Long]("bucket_n")} != 2"))
    }
    // unique texts ⇒ unique content ⇒ exactly one bucket per doc
    val buckets = out.map(r =>
      (r.getAs[Long]("ahash_hi"), r.getAs[Long]("ahash_lo"))).distinct
    assert(buckets.length === byDoc.size)
  }

  test("m11 corpus invariant: cuts exactly at segment boundaries") {
    val out = graft.SparkEntry.queries("m11_video_scene_cuts")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val f = r.getAs[Long]("f")
      val cut = r.getAs[Long]("is_cut")
      val sad = r.getAs[Long]("sad")
      if (f % 3 == 0) assert(cut == 1L && sad > 512L,
        s"expected a cut at segment boundary f=$f (sad=$sad)")
      else assert(cut == 0L && sad == 0L,
        s"expected an identical-frame run at f=$f (sad=$sad)")
    }
  }
}
