package graft.ops

/**
 * Pure-JVM PGM (P5, binary graymap) codec — the REAL decode behind the
 * registry's multimodal rows (m02 decodes actual image bytes, m03 resizes
 * actual pixel grids), replacing the md5-stand-in the earlier rounds
 * shipped. PGM is chosen deliberately: it is a real, widely-produced image
 * format (netpbm), its codec is implementable exactly with zero native
 * libraries (this container has none), and decoded pixel values are plain
 * unsigned bytes — so decode → feature/resize → digest stays bit-exact and
 * DuckDB-replayable, which keeps the m-family inside the same hash-checked
 * correctness gate as every relational row.
 *
 * Format (netpbm spec): magic `P5`, then whitespace-separated width,
 * height, maxval tokens — `#`-to-end-of-line comments legal anywhere in
 * the header whitespace — then ONE whitespace byte, then width*height raw
 * pixel bytes (maxval ≤ 255 ⇒ 1 byte/pixel; the >255 two-byte form is
 * rejected, not silently misread).
 *
 * Scale: the codec is per-row CPU inside `mapPartitions` — no shuffle, no
 * state; on a cluster it parallelizes like any projection. A production
 * swap-in for JPEG/PNG replaces [[decode]]'s body behind the same
 * signature; everything downstream (batching, features, resize, digest)
 * is format-agnostic.
 */
object Pgm {

  /** Decoded image: `pixels` row-major, one SIGNED byte per pixel — read
    * values through `& 0xff` (the codec stores the raw unsigned byte). */
  final case class Image(width: Int, height: Int, maxVal: Int,
                         pixels: Array[Byte])

  /** Serialize to P5 bytes: minimal canonical header (single spaces, no
    * comments), `maxVal` ≤ 255 enforced. */
  def encode(img: Image): Array[Byte] = {
    require(img.maxVal > 0 && img.maxVal <= 255,
      s"P5 single-byte form requires 0 < maxval <= 255, got ${img.maxVal}")
    require(img.width > 0 && img.height > 0,
      s"non-positive dimensions ${img.width}x${img.height}")
    // Long product: 65536x65536 wraps the Int product to 0 and an EMPTY
    // buffer would pass — the decode-side guard, encode edition
    require(img.pixels.length.toLong == img.width.toLong * img.height,
      s"pixel buffer ${img.pixels.length} != ${img.width}x${img.height}")
    val header = s"P5\n${img.width} ${img.height}\n${img.maxVal}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Parse P5 bytes (comment- and whitespace-tolerant header, per the
    * netpbm spec). Throws IllegalArgumentException on anything malformed:
    * wrong magic, missing tokens, maxval outside (0, 255], truncated pixel
    * data. Trailing bytes beyond width*height are rejected too — a real
    * corpus surfaces concatenation bugs as loud errors, not skewed stats. */
  def decode(bytes: Array[Byte]): Image = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed PGM at byte $pos: $msg")
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
    // one whitespace run, with #-comments running to end of line
    def skipWs(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < bytes.length && isWs(bytes(pos))) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moved = true
        }
      }
    }
    def token(): Int = {
      skipWs()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      if (pos == start) fail("expected a header token")
      val s = new String(bytes, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
      try s.toInt catch { case _: NumberFormatException =>
        fail(s"non-numeric header token '$s'") }
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '5')
      fail("magic is not P5")
    pos = 2
    val w = token(); val h = token(); val maxVal = token()
    if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
    if (maxVal <= 0 || maxVal > 255)
      fail(s"maxval $maxVal outside single-byte (0, 255]")
    // exactly ONE whitespace byte separates header from raster
    if (pos >= bytes.length || !isWs(bytes(pos))) fail("missing raster separator")
    pos += 1
    // long arithmetic: a crafted header like 65536x65536 would wrap an
    // Int product to 0 and sail past the raster-length checks below
    val nL = w.toLong * h
    if (nL > bytes.length.toLong)
      fail(s"raster truncated: ${bytes.length - pos} of $nL pixel bytes")
    val n = nL.toInt
    if (bytes.length - pos < n)
      fail(s"raster truncated: ${bytes.length - pos} of $n pixel bytes")
    if (bytes.length - pos > n)
      fail(s"trailing ${bytes.length - pos - n} bytes after raster")
    val px = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
    Image(w, h, maxVal, px)
  }

  /** Nearest-neighbor resample to (tw, th): dst(x, y) = src(⌊x·sw/tw⌋,
    * ⌊y·sh/th⌋) — the convention an oracle can replay with integer
    * division. Pure pixel-grid arithmetic on the DECODED image. */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    require(tw > 0 && th > 0, s"non-positive target ${tw}x$th")
    require(tw.toLong * th <= Int.MaxValue,
      s"target ${tw}x$th overflows the byte-array bound")
    val out = new Array[Byte](tw * th)
    var y = 0
    while (y < th) {
      // Long index arithmetic: y·sh (and x·sw) wrap Int when both
      // factors exceed ~2^15.5 — e.g. downscaling a 1x2^20 strip; the
      // quotient is always a valid Int pixel coordinate
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        out(y * tw + x) = img.pixels(
          (sy.toLong * img.width + x.toLong * img.width / tw).toInt)
        x += 1
      }
      y += 1
    }
    Image(tw, th, img.maxVal, out)
  }
}
