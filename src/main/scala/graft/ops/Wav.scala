package graft.ops

/**
 * Pure-JVM WAV (RIFF, 8-bit unsigned mono PCM) codec — the m-family's
 * SECOND real modality beside [[Pgm]]'s images. WAV is chosen the same
 * way PGM was: a real, widely-produced container (every audio toolchain
 * writes it), exactly implementable with zero native libraries, and
 * 8-bit PCM samples are plain unsigned bytes — so decode → moments →
 * gate stays bit-exact and DuckDB-replayable, keeping the audio rows
 * inside the same hash-checked correctness gate as the image rows.
 *
 * Container layout (RIFF/WAVE spec):
 *   "RIFF" <u32le riffSize> "WAVE"
 *   "fmt " <u32le 16> <u16le format=1 (PCM)> <u16le channels>
 *          <u32le sampleRate> <u32le byteRate> <u16le blockAlign>
 *          <u16le bitsPerSample>
 *   "data" <u32le dataSize> <dataSize sample bytes>
 * Unknown chunks between "fmt " and "data" are skipped per the spec
 * (real encoders emit LIST/fact chunks); everything malformed — wrong
 * magic, non-PCM, stereo, non-8-bit, truncated data, trailing garbage —
 * throws loudly (the [[Pgm.decode]] codec contract: a corpus surfaces
 * container bugs as errors, not as skewed stats).
 *
 * Scale: per-row CPU inside `mapPartitions` — no shuffle, no state; a
 * production swap-in for FLAC/MP3 replaces [[decode]]'s body behind the
 * same signature.
 */
object Wav {

  /** Decoded clip: `samples` as raw unsigned bytes (read via `& 0xff`;
    * 8-bit PCM is unsigned with 128 = silence, per the WAV spec). */
  final case class Clip(sampleRate: Int, samples: Array[Byte])

  /** Serialize to RIFF/WAVE bytes: canonical 44-byte header, 8-bit
    * unsigned mono PCM. An odd-length data chunk gets the RIFF-mandated
    * pad byte (chunk SIZE still records the unpadded length), so
    * emitted files are spec-valid for external tools. */
  def encode(clip: Clip): Array[Byte] = {
    require(clip.sampleRate > 0, s"bad sample rate ${clip.sampleRate}")
    val n = clip.samples.length
    // header + pad must fit the byte-array bound (44 + n + pad would
    // otherwise wrap to a negative allocation, an unlabeled crash)
    require(n <= Int.MaxValue - 45, s"clip of $n samples overflows RIFF")
    val pad = n & 1
    val out = new Array[Byte](44 + n + pad)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(36 + n + pad)
    bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(16)
    bb.putShort(1)                       // PCM
    bb.putShort(1)                       // mono
    bb.putInt(clip.sampleRate)
    bb.putInt(clip.sampleRate)           // byteRate = rate·ch·bits/8
    bb.putShort(1)                       // blockAlign
    bb.putShort(8)                       // bits per sample
    bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(n)
    bb.put(clip.samples)
    out
  }

  /** Parse RIFF/WAVE bytes. Accepts only the form this engine's audio
    * rows gate on — PCM, mono, 8-bit — and skips unknown chunks before
    * "data". Throws IllegalArgumentException on anything malformed. */
  def decode(bytes: Array[Byte]): Clip = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WAV: $msg")
    if (bytes.length < 44) fail(s"only ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t)
      new String(t, java.nio.charset.StandardCharsets.US_ASCII)
    }
    if (tag() != "RIFF") fail("missing RIFF magic")
    val riffSize = bb.getInt
    if (riffSize != bytes.length - 8)
      fail(s"RIFF size $riffSize != ${bytes.length - 8}")
    if (tag() != "WAVE") fail("missing WAVE form type")
    if (tag() != "fmt ") fail("first chunk is not fmt")
    // real PCM encoders write fmt as 16 bytes OR the 18-byte form with
    // cbSize = 0 (WAVEFORMATEX) — both are spec-valid plain PCM
    val fmtSize = bb.getInt
    if (fmtSize != 16 && fmtSize != 18) fail(s"fmt chunk size $fmtSize")
    if (bb.getShort != 1) fail("not PCM")
    if (bb.getShort != 1) fail("not mono")
    val rate = bb.getInt
    if (rate <= 0) fail(s"bad sample rate $rate")
    val byteRate = bb.getInt
    if (byteRate != rate) fail(s"byteRate $byteRate != rate $rate")
    if (bb.getShort != 1) fail("blockAlign != 1")
    if (bb.getShort != 8) fail("not 8-bit")
    if (fmtSize == 18) {
      if (bb.remaining < 2) fail("truncated fmt extension")
      if (bb.getShort != 0) fail("non-zero cbSize on a PCM fmt chunk")
    }
    // skip unknown chunks until "data"
    var dataSize = -1
    while (dataSize < 0) {
      if (bb.remaining < 8) fail("no data chunk")
      val t = tag()
      val sz = bb.getInt
      if (sz < 0 || sz > bb.remaining) fail(s"chunk $t size $sz overruns")
      if (t == "data") dataSize = sz
      else {
        // skip body + the RIFF pad byte; an odd chunk ending exactly at
        // the buffer is missing its mandated pad — fail with the codec's
        // label, not a raw ByteBuffer error
        val skip = sz + (sz & 1)
        if (skip > bb.remaining) fail(s"chunk $t size $sz missing pad byte")
        bb.position(bb.position() + skip)
      }
    }
    val samples = new Array[Byte](dataSize)
    bb.get(samples)
    // an odd data chunk carries the RIFF-mandated pad byte; anything
    // beyond that is a concatenation bug and must fail loudly
    if ((dataSize & 1) == 1 && bb.remaining == 1) bb.get()
    if (bb.remaining != 0) fail(s"${bb.remaining} trailing bytes")
    Clip(rate, samples)
  }
}
