package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The real WAV codec behind m08: RIFF/fmt/data parsing per the spec
  * (unknown-chunk skipping, even padding), loud failure on malformed
  * bytes, and the Spark batch plumbing over it. */
class WavSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("encode/decode roundtrip preserves every sample incl. 0 and 255") {
    val smp = Array[Byte](0, -1, 127, -128, 64)  // unsigned 0,255,127,128,64
    val clip = Wav.Clip(8000, smp)
    val back = Wav.decode(Wav.encode(clip))
    assert(back.sampleRate === 8000)
    assert(back.samples.toSeq === smp.toSeq)
  }

  test("decode skips unknown chunks before data (LIST/fact)") {
    // hand-build: RIFF [WAVE fmt(16) LIST(3, odd → 1 pad) data(2)]
    val fmt = {
      val bb = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(ascii("fmt ")).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
      bb.array()
    }
    val list = ascii("LIST") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // +pad
    val data = ascii("data") ++ Array[Byte](2, 0, 0, 0, 10, 20)
    val body = ascii("WAVE") ++ fmt ++ list ++ data
    val riff = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(ascii("RIFF")).putInt(body.length).put(body)
      bb.array()
    }
    val clip = Wav.decode(riff)
    assert(clip.samples.toSeq === Seq[Byte](10, 20))
  }

  test("decode accepts the 18-byte WAVEFORMATEX PCM fmt form (cbSize 0)") {
    val data = ascii("data") ++ Array[Byte](2, 0, 0, 0, 10, 20)
    val fmt18 = {
      val bb = java.nio.ByteBuffer.allocate(26)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(ascii("fmt ")).putInt(18).putShort(1).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8).putShort(0)
      bb.array()
    }
    val body = ascii("WAVE") ++ fmt18 ++ data
    val riff = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(ascii("RIFF")).putInt(body.length).put(body)
      bb.array()
    }
    assert(Wav.decode(riff).samples.toSeq === Seq[Byte](10, 20))
    // non-zero cbSize is NOT plain PCM — must fail
    val bad = riff.clone(); bad(36) = 2
    intercept[IllegalArgumentException](Wav.decode(bad))
  }

  test("odd unknown chunk ending at the buffer fails with the codec label") {
    // JUNK(3, NO pad byte, nothing after) — the skip would run past the
    // buffer; must fail as 'malformed WAV', not a raw ByteBuffer error
    val fmt = {
      val bb = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(ascii("fmt ")).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
      bb.array()
    }
    val junk = ascii("JUNK") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3) // no pad
    val body = ascii("WAVE") ++ fmt ++ junk ++
      ascii("data") ++ Array[Byte](2, 0, 0, 0, 10, 20)
    // cut the stream right after the unpadded junk body (drop data chunk)
    val trunc = body.take(body.length - 10)
    val riff = {
      val bb = java.nio.ByteBuffer.allocate(8 + trunc.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(ascii("RIFF")).putInt(trunc.length).put(trunc)
      bb.array()
    }
    val ex = intercept[IllegalArgumentException](Wav.decode(riff))
    assert(ex.getMessage.contains("malformed WAV"))
  }

  test("encode pads an odd data chunk per the RIFF spec; decode strips it") {
    val odd = Wav.encode(Wav.Clip(8000, Array[Byte](1, 2, 3)))
    assert(odd.length % 2 === 0)             // padded file
    assert(Wav.decode(odd).samples.toSeq === Seq[Byte](1, 2, 3))
    // more than the single pad byte is still a loud error
    intercept[IllegalArgumentException](
      Wav.decode(odd ++ Array[Byte](0, 0)))
  }

  test("decode rejects malformed bytes loudly") {
    val ok = Wav.encode(Wav.Clip(8000, Array[Byte](1, 2, 3, 4)))
    intercept[IllegalArgumentException](Wav.decode(ok.dropRight(1))) // truncated
    intercept[IllegalArgumentException](Wav.decode(ok :+ 0.toByte))  // trailing
    intercept[IllegalArgumentException] {                            // not RIFF
      val bad = ok.clone(); bad(0) = 'X'.toByte; Wav.decode(bad)
    }
    intercept[IllegalArgumentException] {                            // stereo
      val bad = ok.clone(); bad(22) = 2; Wav.decode(bad)
    }
    intercept[IllegalArgumentException] {                            // 16-bit
      val bad = ok.clone(); bad(34) = 16; Wav.decode(bad)
    }
    intercept[IllegalArgumentException](Wav.decode(Array[Byte](1, 2)))
  }

  test("encodeWavFromText → audioStatsBatched: moments = derived samples") {
    val df = Seq((1L, "hello", 20), (2L, "", 64),
      (3L, null.asInstanceOf[String], 7)).toDF("doc_id", "text", "n")
    val got = Multimodal.audioStatsBatched(
      Multimodal.encodeWavFromText(df, "doc_id", "text", col("n")),
      "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // independent sample derivation (the oracle's definition)
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, t, n) <- Seq((1L, "hello", 20), (2L, "", 64), (3L, "", 7))) {
      val smp = (0 until n).map { i =>
        md.reset()
        md.digest((t + "#" + (i / 16))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))(i % 16) & 0xff
      }
      val r = got(id)
      assert(r.getAs[Long]("sample_rate") === 8000L)
      assert(r.getAs[Long]("n_samples") === n.toLong)
      assert(r.getAs[Long]("amp_sum") === smp.map(_.toLong).sum)
      assert(r.getAs[Long]("amp_sq") === smp.map(v => v.toLong * v).sum)
    }
  }

  test("padSilence + audioFingerprintBatched: trim-invariant collapse") {
    val smp = Array[Byte](10, -1, 0, 50, 127, -128, 60, 70, 80, 90)
    val base = Seq((1L, Wav.encode(Wav.Clip(8000, smp)), 5))
      .toDF("doc_id", "payload", "p")
    val padded = Multimodal.padSilence(base, "doc_id", "payload", col("p"))
    val both = base.select(col("doc_id"), col("payload"))
      .withColumn("tag", lit("orig"))
      .unionByName(padded.withColumn("tag", lit("pad")))
    val fps = Multimodal.audioFingerprintBatched(both, "doc_id", "tag",
      "payload").collect().map(r =>
        r.getAs[String]("tag") ->
          (r.getAs[Long]("trim_len"), r.getAs[String]("energy_csv"))).toMap
    // -128 is unsigned 128 = silence mid-clip; only TRAILING silence trims
    assert(fps("orig") === fps("pad"))
    assert(fps("orig")._1 === 10L)
    // hand energies: frame(i) = i*8/10; sample unsigned values
    val us = smp.map(_ & 0xff)
    val e = new Array[Long](8)
    us.zipWithIndex.foreach { case (v, i) =>
      e(i * 8 / 10) += ((v - 128).toLong * (v - 128)) }
    assert(fps("orig")._2 === e.mkString(","))
    // a clip that IS all silence trims to zero and fingerprints as zeros
    val silent = Seq((2L, Wav.encode(Wav.Clip(8000,
      Array.fill[Byte](6)(128.toByte))), 0)).toDF("doc_id", "payload", "p")
    val z = Multimodal.audioFingerprintBatched(
      silent.withColumn("tag", lit("o")), "doc_id", "tag", "payload")
      .collect()(0)
    assert(z.getAs[Long]("trim_len") === 0L)
    assert(z.getAs[String]("energy_csv") === Array.fill(8)(0L).mkString(","))
  }

  test("vadSegmentsBatched: boundary wobble joins the run, short dips " +
      "don't split, trailing silence excluded") {
    // positions 0-8: speech (200); 9: in-BAND speech sample (126) that
    // must JOIN the following silence run (detection, not construction);
    // 10-17: silence; 18-22: speech with a 2-sample interior dip (130 —
    // inside the band but shorter than minSilence, must NOT split and
    // stays inside the span/energy); 23-29: short trailing silence
    // (7 < 8) that must not emit or extend anything.
    val smp = (Array.fill(9)(200) ++ Array(126) ++ Array.fill(8)(128) ++
      Array(200, 200, 130, 130, 200) ++ Array.fill(7)(128))
      .map(_.toByte)
    val df = Seq((1L, Wav.encode(Wav.Clip(8000, smp))))
      .toDF("doc_id", "payload")
    val got = Multimodal.vadSegmentsBatched(df, "doc_id", "payload",
        tol = 4, minSilence = 8)
      .orderBy("seg").collect()
      .map(r => (r.getAs[Long]("seg"), r.getAs[Long]("seg_start"),
        r.getAs[Long]("seg_len"), r.getAs[Long]("energy")))
    val d72 = 72L * 72L
    assert(got.toSeq === Seq(
      (0L, 0L, 9L, 9L * d72),
      (1L, 18L, 5L, 3L * d72 + 2L * 4L)))
  }

  test("m08 gate: length is the discriminating rule on this corpus") {
    val out = graft.SparkEntry.queries("m08_audio_quality_gate")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every row's keep flag re-derives from its own published moments
    rows.foreach { r =>
      val pass = r.getAs[Long]("n_samples") >= 96L &&
        r.getAs[Double]("amp_mean") >= 96.0 &&
        r.getAs[Double]("amp_mean") <= 160.0 &&
        r.getAs[Double]("amp_std") >= 16.0
      assert(r.getAs[Long]("keep") === (if (pass) 1L else 0L))
    }
    // both classes occur and only length discriminates (md5 samples are
    // near-uniform: offset/flatness pass)
    val kept = rows.count(_.getAs[Long]("keep") == 1L)
    assert(kept > 0 && kept < rows.length)
    rows.filter(_.getAs[Long]("keep") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_samples") < 96L)
    }
  }

  test("resampleWavBatched: exact block floor-means, odd tail dropped, " +
      "rate halves through a real re-encode") {
    // 5 samples at factor 2: blocks (10,21)->15, (40,41)->40; tail 99 drops
    val smp = Array[Byte](10, 21, 40, 41, 99)
    val df = Seq((1L, Wav.encode(Wav.Clip(8000, smp))))
      .toDF("doc_id", "payload")
    val out = Multimodal.resampleWavBatched(df, "doc_id", "payload", 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("sample_rate") == 4000L)
    assert(r.getAs[Long]("n_in") == 5L && r.getAs[Long]("n_out") == 2L)
    assert(r.getAs[String]("samp_csv") == "15,40")
    assert(r.getAs[Long]("amp_sum") == 55L)
    assert(r.getAs[Long]("amp_min") == 15L && r.getAs[Long]("amp_max") == 40L)
    // high-byte samples: unsigned arithmetic, not signed-byte wraparound
    val hi = Array[Byte](-1, -3) // unsigned 255, 253 -> floor-mean 254
    val out2 = Multimodal.resampleWavBatched(
      Seq((2L, Wav.encode(Wav.Clip(8000, hi)))).toDF("doc_id", "payload"),
      "doc_id", "payload", 2).collect().head
    assert(out2.getAs[String]("samp_csv") == "254")
    // shorter-than-factor clip fails loudly, never emits an empty clip
    val bad = Seq((3L, Wav.encode(Wav.Clip(8000, Array[Byte](7)))))
      .toDF("doc_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.resampleWavBatched(bad, "doc_id", "payload", 2).collect()
    }
    assert(ex.getMessage.contains("shorter than factor")
      || Option(ex.getCause).exists(
        _.getMessage.contains("shorter than factor")))
  }
}
