package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The real PGM codec behind m02/m03: header parsing per the netpbm spec
  * (comments, whitespace runs), loud failure on malformed bytes, exact
  * nearest-neighbor resampling, and the Spark batch plumbing over it. */
class PgmSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("decode parses a comment-bearing header and the raster") {
    val px = Array[Byte](1, 2, 3, 4, 5, 6)
    val bytes = ascii("P5 # a comment\n# another line\n 3\t2\n255\n") ++ px
    val img = Pgm.decode(bytes)
    assert((img.width, img.height, img.maxVal) === ((3, 2, 255)))
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("decode rejects malformed bytes loudly") {
    val ok = Pgm.encode(Pgm.Image(2, 2, 255, Array[Byte](9, 8, 7, 6)))
    intercept[IllegalArgumentException](Pgm.decode(ascii("P6\n1 1\n255\n") ++
      Array[Byte](0)))                                    // wrong magic
    intercept[IllegalArgumentException](Pgm.decode(ok.dropRight(1)))  // truncated
    intercept[IllegalArgumentException](Pgm.decode(ok :+ 0.toByte))   // trailing
    intercept[IllegalArgumentException](Pgm.decode(ascii("P5\n2 2\n300\n")
      ++ Array.fill[Byte](8)(0)))                         // 2-byte maxval form
    intercept[IllegalArgumentException](Pgm.decode(ascii("P5\n2 x\n255\n")
      ++ Array.fill[Byte](4)(0)))                         // non-numeric token
  }

  test("encode/decode roundtrip preserves every byte incl. 0 and 255") {
    val px = Array[Byte](0, -1, 127, -128)  // unsigned 0, 255, 127, 128
    val img = Pgm.Image(2, 2, 255, px)
    val back = Pgm.decode(Pgm.encode(img))
    assert(back === img.copy(pixels = back.pixels))
    assert(back.pixels.toSeq === px.toSeq)
  }

  test("resizeNearest: dst(x,y) = src(⌊x·sw/tw⌋, ⌊y·sh/th⌋)") {
    val img = Pgm.Image(4, 2, 255,
      Array[Byte](0, 10, 20, 30, 40, 50, 60, 70))
    val rs = Pgm.resizeNearest(img, 2, 1)
    assert((rs.width, rs.height) === ((2, 1)))
    assert(rs.pixels.toSeq === Seq[Byte](0, 20))
    // upscale repeats source pixels
    val up = Pgm.resizeNearest(Pgm.Image(2, 1, 255, Array[Byte](5, 9)), 4, 2)
    assert(up.pixels.toSeq === Seq[Byte](5, 5, 9, 9, 5, 5, 9, 9))
  }

  test("encodePgmFromText → decodePgmBatched: decoded grid = derived grid") {
    val df = Seq((1L, "hello"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Multimodal.decodePgmBatched(
      Multimodal.encodePgmFromText(df, "doc_id", "text"), "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // independent pixel derivation (the oracle's definition)
    def pixels(t: String): Seq[Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 8).flatMap { b =>
        md.reset()
        md.digest((t + "#" + b)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map(_ & 0xff).toSeq
      }
    }
    Seq(1L -> "hello", 2L -> "", 3L -> "").foreach { case (id, t) =>
      val exp = pixels(t)
      val r = got(id)
      assert(r.getAs[Long]("width") === 16L)
      assert(r.getAs[Long]("height") === 8L)
      assert(r.getAs[Long]("maxval") === 255L)
      assert(r.getAs[Long]("px_sum") === exp.map(_.toLong).sum)
      assert(r.getAs[Long]("px_min") === exp.min.toLong)
      assert(r.getAs[Long]("px_max") === exp.max.toLong)
      assert(r.getAs[String]("px_csv") === exp.mkString(","))
    }
  }

  test("encodePgmSized: per-row dims, raster = derived grid cut at w*h") {
    val df = Seq((1L, "alpha", 5, 3), (2L, "beta", 16, 8), (3L, "", 1, 1))
      .toDF("doc_id", "text", "w", "h")
    val got = Multimodal.decodePgmBatched(
      Multimodal.encodePgmSized(df, "doc_id", "text", col("w"), col("h")),
      "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def pixels(t: String, n: Int): Seq[Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 to (n - 1) / 16).flatMap { b =>
        md.reset()
        md.digest((t + "#" + b)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map(_ & 0xff).toSeq
      }.take(n)
    }
    Seq((1L, "alpha", 5, 3), (2L, "beta", 16, 8), (3L, "", 1, 1))
      .foreach { case (id, t, w, h) =>
        val r = got(id)
        assert(r.getAs[Long]("width") === w.toLong)
        assert(r.getAs[Long]("height") === h.toLong)
        assert(r.getAs[String]("px_csv")
          === pixels(t, w * h).mkString(","))
      }
  }

  test("aHash64Batched: hand-computed bits on an 8x8 ramp; unsigned halves") {
    // pixels 0..63: sum = 2016, bit k set iff k·64 > 2016 ⇔ k ≥ 32 —
    // exactly the high half: lo = 0, hi = 2^32 − 1 (all 32 bits)
    val px = Array.tabulate(64)(_.toByte)
    val payload = Pgm.encode(Pgm.Image(8, 8, 255, px))
    val out = Multimodal.aHash64Batched(
        Seq((1L, "o", payload)).toDF("id", "tag", "payload"),
        "id", "tag", "payload")
      .select("width", "height", "ahash_lo", "ahash_hi")
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((8L, 8L, 0L, 0xFFFFFFFFL)))
  }

  test("aHash collapses an image with its halfPayload thumbnail " +
      "(integer-ratio pyramid), and separates a genuinely different image") {
    val a = Array.tabulate(256)(i => (i % 251).toByte) // 16x16
    val b = Array.tabulate(256)(i => (255 - i % 251).toByte)
    val df = Seq((1L, Pgm.encode(Pgm.Image(16, 16, 255, a))),
      (2L, Pgm.encode(Pgm.Image(16, 16, 255, b)))).toDF("id", "payload")
    val thumbs = Multimodal.halfPayload(df, "id", "payload")
    val all = df.withColumn("tag", lit("orig"))
      .unionByName(thumbs.withColumn("tag", lit("thumb")))
    val h = Multimodal.aHash64Batched(all, "id", "tag", "payload")
      .select("id", "tag", "ahash_lo", "ahash_hi")
      .as[(Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(h((1L, "orig")) == h((1L, "thumb")))
    assert(h((2L, "orig")) == h((2L, "thumb")))
    assert(h((1L, "orig")) != h((2L, "orig")))
  }

  test("resizePgmBatched 16x8→4x4 keeps pixels at (4x, 2y)") {
    val df = Seq((7L, "resize me")).toDF("doc_id", "text")
    val enc = Multimodal.encodePgmFromText(df, "doc_id", "text")
    val full = Multimodal.decodePgmBatched(enc, "doc_id", "payload")
      .select("px_csv").as[String].head().split(",").map(_.toInt)
    val rs = Multimodal.resizePgmBatched(enc, "doc_id", "payload", 4, 4)
      .collect().head
    val exp = for (y <- 0 until 4; x <- 0 until 4) yield full(2 * y * 16 + 4 * x)
    assert(rs.getAs[Long]("width") === 4L)
    assert(rs.getAs[Long]("height") === 4L)
    assert(rs.getAs[String]("px_csv") === exp.mkString(","))
    assert(rs.getAs[Long]("px_sum") === exp.map(_.toLong).sum)
  }

  test("qualityStatsBatched: exact Σp and Σp² against the csv decode") {
    val df = Seq((9L, "moments"), (10L, "of a gate")).toDF("doc_id", "text")
    val enc = Multimodal.encodePgmFromText(df, "doc_id", "text")
    val csv = Multimodal.decodePgmBatched(enc, "doc_id", "payload")
      .select("doc_id", "px_csv").as[(Long, String)].collect().toMap
    val qs = Multimodal.qualityStatsBatched(enc, "doc_id", "payload")
      .collect()
    assert(qs.length == 2)
    qs.foreach { r =>
      val px = csv(r.getAs[Long]("doc_id")).split(",").map(_.toLong)
      assert(r.getAs[Long]("px_sum") === px.sum)
      assert(r.getAs[Long]("px_sq") === px.map(v => v * v).sum)
      assert(r.getAs[Long]("width") * r.getAs[Long]("height")
        === px.length.toLong)
    }
  }
}
